"""SwinIR — transformer SR with shifted-window attention.

Reference parity: archs/swinir_arch.py:694 (SwinIR: shallow conv -> RSTB
stack (Swin blocks + conv) -> upsampler variants).  NHWC flax re-design:
window partition is pure reshape/transpose, attention is einsum (MXU), the
shift is jnp.roll with the standard shifted-window attention mask, relative
position bias is a learned (2w-1)^2 table."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.arch_util import pixel_shuffle, resize_nearest
from ssl_tpu.utils.registry import ARCH_REGISTRY


def _rel_pos_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # (w^2, w^2)


def _attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Mask distinguishing the 9 shifted regions (standard Swin scheme)."""
    img_mask = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    mask = img_mask.reshape(h // window, window, w // window, window)
    mask = mask.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = mask[:, None, :] - mask[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)  # (nw, w^2, w^2)


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (num_windows*b, n, c)
        bw, n, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(c * 3, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (head_dim ** -0.5), k)
        table = self.param("rel_pos_bias",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * self.window - 1) ** 2, self.num_heads))
        idx = jnp.asarray(_rel_pos_index(self.window).reshape(-1))
        bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.num_heads, n, n) + mask[None, :, None]
            attn = attn.reshape(bw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x):
        # x: (b, h, w, c), h/w multiples of window
        b, h, w, c = x.shape
        win = self.window
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5)(x)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_attn_mask(h, w, win, self.shift))
        else:
            mask = None
        yw = y.reshape(b, h // win, win, w // win, win, c)
        yw = yw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
        yw = WindowAttention(self.dim, win, self.num_heads)(yw, mask)
        y = yw.reshape(b, h // win, w // win, win, win, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + y
        # MLP
        y = nn.LayerNorm(epsilon=1e-5)(x)
        y = nn.Dense(int(c * self.mlp_ratio))(y)
        y = nn.gelu(y)
        y = nn.Dense(c)(y)
        return x + y


class _SwinPairCell(nn.Module):
    """One (no-shift, shift) Swin block pair as an nn.scan cell."""
    dim: int
    num_heads: int
    window: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, carry, _):
        x = SwinBlock(self.dim, self.num_heads, self.window, shift=0,
                      mlp_ratio=self.mlp_ratio)(carry)
        x = SwinBlock(self.dim, self.num_heads, self.window, shift=self.window // 2,
                      mlp_ratio=self.mlp_ratio)(x)
        return x, None


class RSTB(nn.Module):
    """Residual Swin Transformer Block: depth Swin blocks + trailing conv.

    TPU note: with even depth and scan_blocks (default) the (shift, no-shift)
    block pairs run under nn.scan + remat — one compiled pair body instead of
    `depth` inlined copies (params stacked (depth//2, ...))."""
    dim: int
    depth: int
    num_heads: int
    window: int
    mlp_ratio: float = 2.0
    scan_blocks: bool = True

    @nn.compact
    def __call__(self, x):
        res = x
        if self.scan_blocks and self.depth % 2 == 0 and self.depth > 2:
            Scan = nn.scan(nn.remat(_SwinPairCell), variable_axes={"params": 0},
                           split_rngs={"params": True}, length=self.depth // 2,
                           metadata_params={nn.meta.PARTITION_NAME: None})
            x, _ = Scan(self.dim, self.num_heads, self.window, self.mlp_ratio,
                        name="pairs")(x, None)
        else:
            for i in range(self.depth):
                x = SwinBlock(self.dim, self.num_heads, self.window,
                              shift=0 if i % 2 == 0 else self.window // 2,
                              mlp_ratio=self.mlp_ratio, name=f"block_{i}")(x)
        x = nn.Conv(self.dim, (3, 3), padding="SAME", name="conv")(x)
        return x + res


@ARCH_REGISTRY.register()
class SwinIR(nn.Module):
    """SwinIR generator (reference swinir_arch.py:694-979).

    upsampler: 'pixelshuffle' (classical), 'pixelshuffledirect' (lightweight),
    'nearest+conv' (real-world), '' (denoising, same-size)."""
    upscale: int = 4
    in_chans: int = 3
    img_size: int = 64
    window_size: int = 8
    img_range: float = 1.0
    depths: Sequence[int] = (6, 6, 6, 6)
    embed_dim: int = 96
    num_heads: Sequence[int] = (6, 6, 6, 6)
    mlp_ratio: float = 2.0
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    num_feat: int = 64
    patch_norm: bool = True  # LayerNorm after patch embed (swinir_arch.py:739)

    @nn.compact
    def __call__(self, x):
        h0, w0 = x.shape[1], x.shape[2]
        win = self.window_size
        # reference check_image_size (swinir_arch.py:939-945) ALWAYS pads by
        # cat([x, flip(x)]) — symmetric mirror of a full extra window even
        # when already aligned; output is cropped back below
        ph = (h0 // win + 1) * win - h0
        pw = (w0 // win + 1) * win - w0
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="symmetric")
        mean = jnp.asarray([0.4488, 0.4371, 0.4040]) if self.in_chans == 3 else 0.0
        x = (x - mean) * self.img_range

        feat = nn.Conv(self.embed_dim, (3, 3), padding="SAME", name="conv_first")(x)
        body = feat
        if self.patch_norm:
            body = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(body)
        for i, (d, nh) in enumerate(zip(self.depths, self.num_heads)):
            body = RSTB(self.embed_dim, d, nh, win, self.mlp_ratio, name=f"layer_{i}")(body)
        body = nn.LayerNorm(epsilon=1e-5, name="norm")(body)
        body = nn.Conv(self.embed_dim, (3, 3), padding="SAME", name="conv_after_body")(body)
        feat = feat + body

        if self.upsampler == "pixelshuffle":
            feat = nn.leaky_relu(nn.Conv(self.num_feat, (3, 3), padding="SAME",
                                         name="conv_before_upsample")(feat), 0.01)
            s = self.upscale
            while s > 1:
                f = 3 if s % 3 == 0 else 2
                feat = nn.Conv(self.num_feat * f * f, (3, 3), padding="SAME")(feat)
                feat = pixel_shuffle(feat, f)
                s //= f
            out = nn.Conv(self.in_chans, (3, 3), padding="SAME", name="conv_last")(feat)
        elif self.upsampler == "pixelshuffledirect":
            feat = nn.Conv(self.in_chans * self.upscale ** 2, (3, 3), padding="SAME")(feat)
            out = pixel_shuffle(feat, self.upscale)
        elif self.upsampler == "nearest+conv":
            feat = nn.leaky_relu(nn.Conv(self.num_feat, (3, 3), padding="SAME",
                                         name="conv_before_upsample")(feat), 0.01)
            feat = nn.leaky_relu(nn.Conv(self.num_feat, (3, 3), padding="SAME",
                                         name="conv_up1")(resize_nearest(feat, 2)), 0.2)
            if self.upscale == 4:
                feat = nn.leaky_relu(nn.Conv(self.num_feat, (3, 3), padding="SAME",
                                             name="conv_up2")(resize_nearest(feat, 2)), 0.2)
            feat = nn.leaky_relu(nn.Conv(self.num_feat, (3, 3), padding="SAME",
                                         name="conv_hr")(feat), 0.2)
            out = nn.Conv(self.in_chans, (3, 3), padding="SAME", name="conv_last")(feat)
        else:  # '' — reconstruction at same size (denoise/JPEG CAR)
            out = x + nn.Conv(self.in_chans, (3, 3), padding="SAME", name="conv_last")(feat)

        out = out / self.img_range + mean
        return out[:, : h0 * self.upscale, : w0 * self.upscale, :]
