"""Diffusion UNet with dual conditioning — STRUCTURALLY EQUIVALENT to StableSR.

Reference parity: ldm/modules/diffusionmodules/openaimodel.py —
UNetModelDualcondV2 (:958, SPADE struct-cond inside every ResBlock),
EncoderUNetModelWT (:1341, time-aware struct encoder returning a dict of
per-resolution features keyed by str(width)), ResBlockDual (:343),
SPADE (ldm/modules/spade.py:68), SpatialTransformerV2
(ldm/modules/attention.py:350, use_linear) and AttentionBlock (:463,
QKVAttentionLegacy head-major qkv packing).

NHWC flax re-design with one deliberate constraint: every submodule is named
after its torch path (``input_blocks_3_0`` / ``in_layers_2`` / ``spade_mlp_gamma``
…), so ``convert_sd_unet`` in utils/weight_port.py is a mechanical key
translation and real StableSR checkpoints import losslessly.

Implemented configuration = what StableSR ships (configs/SSL/base.yaml:42-59):
use_scale_shift_norm=False, use_linear_in_transformer=True, conv_resample=True,
dropout=0, legacy=False.  Attention is einsum (MXU) by default;
``use_flash_attention: true`` routes eligible self-attention through the
Pallas TPU flash kernel (ops/attention.py — same function, O(seq) memory).
GroupNorm/LayerNorm eps pinned to torch's 1e-5; GELU is exact
(non-approximate), matching torch.

``compute_dtype``: 'bfloat16' runs conv/linear/attention activations in bf16
to halve HBM traffic (the diffusion step is memory-bound — BASELINE.md MFU
table).  Same precision contract as the GAN-tree knobs (RRDBNet /
UNetDiscriminatorSN): the param tree stays fp32 (checkpoints port
unchanged), norm statistics compute in fp32 (flax promotes), the softmax in
ops/attention.py runs fp32, and the module output is cast back to fp32.
Config key ``model.compute_dtype`` (diffusion CLI) fans the knob out to the
UNet, struct-cond encoder and VAE; pinned by
tests/test_diffusion.py::test_diffusion_bf16_deviation.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.ops.attention import sdp_attention


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _gn(name: str, dt=None):
    """GroupNorm32 (openaimodel normalization()): 32 groups, eps 1e-5.
    With dt=bf16 flax still computes mean/var in fp32 (promoted stats)."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name, dtype=dt)


def _zero_conv(ch: int, name: str, k: int = 3, dt=None):
    return nn.Conv(ch, (k, k), padding=[(k // 2, k // 2)] * 2, name=name,
                   kernel_init=nn.initializers.zeros, dtype=dt)


class ResBlockRef(nn.Module):
    """openaimodel ResBlock (use_scale_shift_norm=False, dropout=0):
    h = zero_conv(silu(GN(conv(silu(GN(x))) + emb_proj))) ; x' = skip(x)+h."""
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, emb):
        dt = self.dtype
        h = _gn("in_layers_0", dt)(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                    name="in_layers_2", dtype=dt)(nn.silu(h))
        emb_out = nn.Dense(self.out_ch, name="emb_layers_1", dtype=dt)(nn.silu(emb))
        h = h + emb_out[:, None, None, :]
        h = _gn("out_layers_0", dt)(h)
        h = _zero_conv(self.out_ch, "out_layers_3", dt=dt)(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="skip_connection", dtype=dt)(x)
        return x + h


class ResBlockDual(nn.Module):
    """ResBlockDual (openaimodel.py:343): ResBlock + SPADE struct-cond
    modulation before the residual add.  ``s_dict`` maps str(width) -> struct
    feature at that resolution (spade.py:95 keys segmap by x.size(-1))."""
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, emb, s_dict):
        dt = self.dtype
        h = _gn("in_layers_0", dt)(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                    name="in_layers_2", dtype=dt)(nn.silu(h))
        emb_out = nn.Dense(self.out_ch, name="emb_layers_1", dtype=dt)(nn.silu(emb))
        h = h + emb_out[:, None, None, :]
        h = _gn("out_layers_0", dt)(h)
        h = _zero_conv(self.out_ch, "out_layers_3", dt=dt)(nn.silu(h))
        # SPADE (nhidden=128 hardcoded in the reference, spade.py:83)
        s = s_dict[str(h.shape[2])]
        normalized = _gn("spade_param_free_norm", dt)(h)
        actv = nn.relu(nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)],
                               name="spade_mlp_shared_0", dtype=dt)(s))
        gamma = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                        name="spade_mlp_gamma", dtype=dt)(actv)
        beta = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                       name="spade_mlp_beta", dtype=dt)(actv)
        h = normalized * (1 + gamma) + beta
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="skip_connection", dtype=dt)(x)
        return x + h


class Downsample(nn.Module):
    """conv_resample downsample: conv3x3 stride 2 pad 1, named 'op'."""
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_ch, (3, 3), strides=(2, 2),
                       padding=[(1, 1), (1, 1)], name="op", dtype=self.dtype)(x)


class Upsample(nn.Module):
    """nearest x2 + conv3x3 pad 1, named 'conv'."""
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                       name="conv", dtype=self.dtype)(x)


class SpatialTransformerV2(nn.Module):
    """attention.py:350 with use_linear=True (SD 2.1 / StableSR layout).

    GN -> flatten -> Linear proj_in -> depth x BasicTransformerBlockV2
    (self-attn, cross-attn with context, GEGLU ff) -> Linear proj_out -> +x."""
    heads: int
    dim_head: int
    depth: int = 1
    use_flash_attention: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context):
        dt = self.dtype
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        y = _gn("norm", dt)(x).reshape(b, h * w, c)
        y = nn.Dense(inner, name="proj_in", dtype=dt)(y)
        for d in range(self.depth):
            p = f"transformer_blocks_{d}"
            y = y + self._attn(nn.LayerNorm(epsilon=1e-5, name=f"{p}_norm1", dtype=dt)(y),
                               None, f"{p}_attn1")
            y = y + self._attn(nn.LayerNorm(epsilon=1e-5, name=f"{p}_norm2", dtype=dt)(y),
                               context, f"{p}_attn2")
            z = nn.LayerNorm(epsilon=1e-5, name=f"{p}_norm3", dtype=dt)(y)
            a = nn.Dense(y.shape[-1] * 4 * 2, name=f"{p}_ff_net_0_proj", dtype=dt)(z)
            a, gate = jnp.split(a, 2, axis=-1)
            y = y + nn.Dense(y.shape[-1], name=f"{p}_ff_net_2", dtype=dt)(
                a * nn.gelu(gate, approximate=False))
        y = nn.Dense(c, name="proj_out", kernel_init=nn.initializers.zeros,
                     dtype=dt)(y)
        return x + y.reshape(b, h, w, c)

    def _attn(self, x, context, prefix):
        dt = self.dtype
        b, n, _ = x.shape
        ctx = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name=f"{prefix}_to_q", dtype=dt)(x)
        k = nn.Dense(inner, use_bias=False, name=f"{prefix}_to_k", dtype=dt)(ctx)
        v = nn.Dense(inner, use_bias=False, name=f"{prefix}_to_v", dtype=dt)(ctx)
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, -1, self.heads, self.dim_head)
        v = v.reshape(b, -1, self.heads, self.dim_head)
        out = sdp_attention(q, k, v, self.dim_head ** -0.5,
                            self.use_flash_attention).reshape(b, n, inner)
        return nn.Dense(x.shape[-1], name=f"{prefix}_to_out_0", dtype=dt)(out)


class AttentionBlockQKV(nn.Module):
    """openaimodel AttentionBlock (:463) with QKVAttentionLegacy packing:
    qkv channels are head-major blocks [q_h | k_h | v_h]."""
    num_heads: int
    use_flash_attention: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        b, h, w, c = x.shape
        d = c // self.num_heads
        y = _gn("norm", dt)(x).reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, name="qkv", dtype=dt)(y)       # torch conv1d k=1
        qkv = qkv.reshape(b, h * w, self.num_heads, 3, d)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        # legacy scaling: q*s . k*s with s = d^-1/4 (bit-equal to the
        # reference on the einsum path; == logits * d^-1/2 under flash)
        scale = 1.0 / math.sqrt(math.sqrt(d))
        out = sdp_attention((q * scale).astype(q.dtype), (k * scale).astype(k.dtype),
                            v, 1.0,
                            self.use_flash_attention).reshape(b, h * w, c)
        out = nn.Dense(c, name="proj_out", kernel_init=nn.initializers.zeros,
                       dtype=dt)(out)
        # residual adds the raw (pre-norm) input, openaimodel.py:509
        return (x.reshape(b, h * w, c) + out).reshape(b, h, w, c)


class UNetModelDualcondV2(nn.Module):
    """Denoiser eps(x_t, t, context, struct_cond_dict) — StableSR dual-cond."""
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = -1
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    semb_channels: int = 256
    use_flash_attention: bool = False
    # bf16 activations (params/norm-stats/output fp32) — docstring above
    compute_dtype: str | None = None

    def _heads(self, ch: int) -> tuple[int, int]:
        if self.num_head_channels > 0:
            return ch // self.num_head_channels, self.num_head_channels
        return self.num_heads, ch // self.num_heads

    @nn.compact
    def __call__(self, x, t, context, struct_feats=None):
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        emb = nn.Dense(self.model_channels * 4, name="time_embed_0", dtype=dt)(
            timestep_embedding(t, self.model_channels))
        emb = nn.Dense(self.model_channels * 4, name="time_embed_2",
                       dtype=dt)(nn.silu(emb))
        s = struct_feats

        ds = 1
        idx = 0
        h = nn.Conv(self.model_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name="input_blocks_0_0", dtype=dt)(x)
        hs = [h]
        idx = 1
        ch = self.model_channels
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = mult * self.model_channels
                h = ResBlockDual(ch, dt, name=f"input_blocks_{idx}_0")(h, emb, s)
                if ds in self.attention_resolutions:
                    heads, dim_head = self._heads(ch)
                    h = SpatialTransformerV2(heads, dim_head, self.transformer_depth,
                                         self.use_flash_attention, dt,
                                             name=f"input_blocks_{idx}_1")(h, context)
                hs.append(h)
                idx += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(ch, dt, name=f"input_blocks_{idx}_0")(h)
                hs.append(h)
                idx += 1
                ds *= 2
        heads, dim_head = self._heads(ch)
        h = ResBlockDual(ch, dt, name="middle_block_0")(h, emb, s)
        h = SpatialTransformerV2(heads, dim_head, self.transformer_depth,
                                         self.use_flash_attention, dt,
                                 name="middle_block_1")(h, context)
        h = ResBlockDual(ch, dt, name="middle_block_2")(h, emb, s)

        idx = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop().astype(h.dtype)], axis=-1)
                ch = self.model_channels * mult
                h = ResBlockDual(ch, dt, name=f"output_blocks_{idx}_0")(h, emb, s)
                j = 1
                if ds in self.attention_resolutions:
                    heads, dim_head = self._heads(ch)
                    h = SpatialTransformerV2(heads, dim_head, self.transformer_depth,
                                         self.use_flash_attention, dt,
                                             name=f"output_blocks_{idx}_{j}")(h, context)
                    j += 1
                if level and i == self.num_res_blocks:
                    h = Upsample(ch, dt, name=f"output_blocks_{idx}_{j}")(h)
                    ds //= 2
                idx += 1
        h = _gn("out_0", dt)(h)
        out = _zero_conv(self.out_channels, "out_2", dt=dt)(nn.silu(h))
        return out.astype(jnp.float32) if dt is not None else out


class EncoderUNetModelWT(nn.Module):
    """Time-aware struct-cond encoder (openaimodel.py:1341): half-UNet whose
    pre-downsample features + middle output pass through per-resolution
    ``fea_tran`` ResBlocks; returns {str(width): feature(out_channels)}."""
    in_channels: int = 4
    model_channels: int = 256
    out_channels: int = 256
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 1, 2, 2)
    num_heads: int = 4
    use_flash_attention: bool = False
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, t):
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        emb = nn.Dense(self.model_channels * 4, name="time_embed_0", dtype=dt)(
            timestep_embedding(t, self.model_channels))
        emb = nn.Dense(self.model_channels * 4, name="time_embed_2",
                       dtype=dt)(nn.silu(emb))

        h = nn.Conv(self.model_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name="input_blocks_0_0", dtype=dt)(x)
        results = []
        idx = 1
        ds = 1
        ch = self.model_channels
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = mult * self.model_channels
                h = ResBlockRef(ch, dt, name=f"input_blocks_{idx}_0")(h, emb)
                if ds in self.attention_resolutions:
                    h = AttentionBlockQKV(self.num_heads, self.use_flash_attention,
                                          dt, name=f"input_blocks_{idx}_1")(h)
                idx += 1
            if level != len(self.channel_mult) - 1:
                results.append(h)  # feature entering the downsample
                h = Downsample(ch, dt, name=f"input_blocks_{idx}_0")(h)
                idx += 1
                ds *= 2
        h = ResBlockRef(ch, dt, name="middle_block_0")(h, emb)
        h = AttentionBlockQKV(self.num_heads, self.use_flash_attention,
                          dt, name="middle_block_1")(h)
        h = ResBlockRef(ch, dt, name="middle_block_2")(h, emb)
        results.append(h)

        out = {}
        for i, r in enumerate(results):
            f = ResBlockRef(self.out_channels, dt, name=f"fea_tran_{i}")(r, emb)
            out[str(r.shape[2])] = f.astype(jnp.float32) if dt is not None else f
        return out
