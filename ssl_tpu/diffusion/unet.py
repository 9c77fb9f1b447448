"""Diffusion UNet with dual conditioning (text context + time-aware structure).

Reference parity: ldm/modules/diffusionmodules/openaimodel.py — UNetModel
(:627), UNetModelDualcondV2 (:958, struct-cond spatial modulation via
semb_channels), EncoderUNetModelWT (:1341, time-aware struct-cond encoder
returning per-resolution features).  NHWC flax re-design: attention is einsum
(MXU), timestep embedding standard sinusoidal -> MLP, struct features injected
with SFT (scale/shift) at matching decoder resolutions."""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _gn(x, name=None):
    c = x.shape[-1]
    groups = 32 if c % 32 == 0 else (math.gcd(c, 32) or 1)
    return nn.GroupNorm(num_groups=groups, epsilon=1e-5, name=name)(x)


class ResBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, emb):
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME")(nn.silu(_gn(x)))
        emb_out = nn.Dense(2 * self.out_ch)(nn.silu(emb))
        scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
        h = _gn(h) * (1 + scale) + shift
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME",
                    kernel_init=nn.initializers.zeros)(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1))(x)
        return x + h


class CrossAttention(nn.Module):
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, context=None):
        # x: (b, n, c); context: (b, m, cc) or None (self-attention)
        b, n, c = x.shape
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, -1, self.heads, self.dim_head)
        v = v.reshape(b, -1, self.heads, self.dim_head)
        attn = jax.nn.softmax(
            jnp.einsum("bnhd,bmhd->bhnm", q, k) * (self.dim_head ** -0.5), axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        return nn.Dense(c, name="to_out")(out)


class TransformerBlock(nn.Module):
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(self.heads, self.dim_head, name="attn1")(nn.LayerNorm()(x))
        x = x + CrossAttention(self.heads, self.dim_head, name="attn2")(nn.LayerNorm()(x), context)
        # GEGLU feed-forward
        y = nn.LayerNorm()(x)
        a = nn.Dense(x.shape[-1] * 8)(y)
        a, gate = jnp.split(a, 2, axis=-1)
        y = a * nn.gelu(gate)
        return x + nn.Dense(x.shape[-1])(y)


class SpatialTransformer(nn.Module):
    heads: int
    dim_head: int
    depth: int = 1

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        y = _gn(x)
        y = nn.Conv(c, (1, 1), name="proj_in")(y).reshape(b, h * w, c)
        for i in range(self.depth):
            y = TransformerBlock(self.heads, self.dim_head, name=f"block_{i}")(y, context)
        y = nn.Conv(c, (1, 1), name="proj_out",
                    kernel_init=nn.initializers.zeros)(y.reshape(b, h, w, c))
        return x + y


class SFTModulation(nn.Module):
    """Structure-feature scale/shift injection (StableSR dual-cond):
    h <- h * (1+scale(s)) + shift(s), learned from the struct feature."""

    @nn.compact
    def __call__(self, h, s):
        if s.shape[1] != h.shape[1]:
            s = jax.image.resize(s, (s.shape[0], h.shape[1], h.shape[2], s.shape[-1]),
                                 method="bilinear")
        y = nn.silu(nn.Conv(h.shape[-1], (3, 3), padding="SAME")(s))
        scale = nn.Conv(h.shape[-1], (3, 3), padding="SAME",
                        kernel_init=nn.initializers.zeros)(y)
        shift = nn.Conv(h.shape[-1], (3, 3), padding="SAME",
                        kernel_init=nn.initializers.zeros)(y)
        return h * (1 + scale) + shift


class UNetModelDualcondV2(nn.Module):
    """Denoiser epsilon(x_t, t, context, struct_feats)."""
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 256
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4)
    num_heads: int = 8
    context_dim: int = 1024
    semb_channels: int = 256

    @nn.compact
    def __call__(self, x, t, context, struct_feats=None):
        emb = nn.Dense(self.model_channels * 4)(
            timestep_embedding(t, self.model_channels))
        emb = nn.Dense(self.model_channels * 4)(nn.silu(emb))

        ds = 1
        h = nn.Conv(self.model_channels, (3, 3), padding="SAME", name="conv_in")(x)
        hs = [h]
        # down
        for level, mult in enumerate(self.channel_mult):
            ch = self.model_channels * mult
            for i in range(self.num_res_blocks):
                h = ResBlock(ch, name=f"down_{level}_res_{i}")(h, emb)
                if ds in self.attention_resolutions:
                    h = SpatialTransformer(self.num_heads, ch // self.num_heads,
                                           name=f"down_{level}_attn_{i}")(h, context)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding="SAME",
                            name=f"down_{level}_downsample")(h)
                hs.append(h)
                ds *= 2
        # middle
        ch = self.model_channels * self.channel_mult[-1]
        h = ResBlock(ch, name="mid_res_1")(h, emb)
        h = SpatialTransformer(self.num_heads, ch // self.num_heads, name="mid_attn")(h, context)
        h = ResBlock(ch, name="mid_res_2")(h, emb)
        # up (with struct-cond SFT injection per resolution)
        for level in reversed(range(len(self.channel_mult))):
            ch = self.model_channels * self.channel_mult[level]
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(ch, name=f"up_{level}_res_{i}")(h, emb)
                if struct_feats is not None and level < len(struct_feats):
                    h = SFTModulation(name=f"up_{level}_sft_{i}")(h, struct_feats[level])
                if ds in self.attention_resolutions:
                    h = SpatialTransformer(self.num_heads, ch // self.num_heads,
                                           name=f"up_{level}_attn_{i}")(h, context)
            if level != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = nn.Conv(c, (3, 3), padding="SAME", name=f"up_{level}_upsample")(h)
                ds //= 2
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    kernel_init=nn.initializers.zeros, name="conv_out")(nn.silu(_gn(h, "norm_out")))
        return h


class EncoderUNetModelWT(nn.Module):
    """Time-aware struct-cond encoder: z_lq + t -> per-resolution features
    (reference openaimodel.py:1341)."""
    in_channels: int = 4
    model_channels: int = 256
    num_res_blocks: int = 2
    channel_mult: Sequence[int] = (1, 2, 4)

    @nn.compact
    def __call__(self, x, t):
        emb = nn.Dense(self.model_channels * 4)(
            timestep_embedding(t, self.model_channels))
        emb = nn.Dense(self.model_channels * 4)(nn.silu(emb))
        h = nn.Conv(self.model_channels, (3, 3), padding="SAME", name="conv_in")(x)
        feats = []
        for level, mult in enumerate(self.channel_mult):
            ch = self.model_channels * mult
            for i in range(self.num_res_blocks):
                h = ResBlock(ch, name=f"enc_{level}_res_{i}")(h, emb)
            feats.append(h)
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding="SAME",
                            name=f"enc_{level}_down")(h)
        return feats  # index = channel_mult level (finest first)
