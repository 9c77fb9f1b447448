"""Scaled-dot-product attention with an optional Pallas TPU flash kernel.

The diffusion tree's hot attentions run at full latent resolution (a 512^2
input is a 64^2 latent -> 4096 tokens at the ds=1 UNet level and in the VAE
mid-block): the einsum path materializes (n, m) logits per head in HBM
(~134 MB/image for 5 heads of 4096^2 bf16), while the flash kernel keeps the
softmax accumulation VMEM-resident (jax.experimental.pallas TPU op, online
softmax with a custom VJP, so it trains).

Reference semantics (ldm/modules/attention.py CrossAttention:152 and
diffusionmodules/model.py:154 attention): plain softmax(qk*scale)v — the
flash path computes the identical function, it only changes the schedule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flash_eligible(n: int, m: int, use_flash: bool) -> bool:
    """TPU backend, lane-aligned sequence lengths, long enough to win.
    The 77-token cross-attention context falls back to einsum."""
    return (use_flash and jax.default_backend() == "tpu"
            and n % 128 == 0 and m % 128 == 0 and n >= 512)


def sdp_attention(q, k, v, sm_scale: float, use_flash: bool = False):
    """softmax(q @ k^T * sm_scale) @ v over (b, seq, heads, d) tensors."""
    b, n, heads, d = q.shape
    m = k.shape[1]
    if flash_eligible(n, m, use_flash):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention)
        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), sm_scale=sm_scale,
            block_sizes=BlockSizes.get_default(b, heads, n, m, d))
        return out.transpose(0, 2, 1, 3)
    # softmax always in fp32 (no-op for fp32 inputs; under bf16 compute_dtype
    # the logits/normalization keep full precision — the flash kernel
    # likewise accumulates fp32 internally)
    attn = jax.nn.softmax(
        (jnp.einsum("bnhd,bmhd->bhnm", q, k) * sm_scale).astype(jnp.float32),
        axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v)
