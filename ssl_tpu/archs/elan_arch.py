"""ELAN — Efficient Long-range Attention Network for image SR.

Reference parity: archs/elan_arch.py (ShiftConv2d, LFE, GMSA group multi-scale
self-attention with shared attention maps, ELAB blocks, pixel-shuffle tail).
NHWC flax re-design: the directional channel shift is expressed with plain
jnp.roll slices (no depthwise conv needed), window attention is einsum on the
MXU."""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.arch_util import pixel_shuffle
from ssl_tpu.utils.registry import ARCH_REGISTRY


def shift_channels(x: jnp.ndarray) -> jnp.ndarray:
    """5-group directional shift: left/right/up/down/identity on channel groups
    (the maths of reference ShiftConv2d1's fixed depthwise kernel, done with
    rolls — cheaper than a conv and fuses into the following 1x1)."""
    c = x.shape[-1]
    g = c // 5
    parts = [
        jnp.roll(x[..., 0 * g:1 * g], -1, axis=2),   # take pixel to the right -> shift left
        jnp.roll(x[..., 1 * g:2 * g], 1, axis=2),    # right
        jnp.roll(x[..., 2 * g:3 * g], -1, axis=1),   # up (take from below)
        jnp.roll(x[..., 3 * g:4 * g], 1, axis=1),    # down
        x[..., 4 * g:],
    ]
    # zero the wrapped border column/row to match conv zero-padding semantics
    h, w = x.shape[1], x.shape[2]
    parts[0] = parts[0].at[:, :, -1].set(0.0)
    parts[1] = parts[1].at[:, :, 0].set(0.0)
    parts[2] = parts[2].at[:, -1, :].set(0.0)
    parts[3] = parts[3].at[:, 0, :].set(0.0)
    return jnp.concatenate(parts, axis=-1)


class ShiftConv(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (1, 1))(shift_channels(x))


class LFE(nn.Module):
    """Local feature extraction: shift-conv expand -> act -> shift-conv."""
    out_channels: int
    exp_ratio: int = 2
    act_type: str = "relu"

    @nn.compact
    def __call__(self, x):
        y = ShiftConv(self.out_channels * self.exp_ratio)(x)
        y = nn.relu(y) if self.act_type == "relu" else nn.gelu(y)
        return ShiftConv(self.out_channels)(y)


def _window_partition(x, wsize):
    b, h, w, c = x.shape
    x = x.reshape(b, h // wsize, wsize, w // wsize, wsize, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wsize * wsize, c)


def _window_merge(x, wsize, h, w):
    b = x.shape[0] // ((h // wsize) * (w // wsize))
    c = x.shape[-1]
    x = x.reshape(b, h // wsize, w // wsize, wsize, wsize, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


class GMSA(nn.Module):
    """Group multi-scale self-attention; can reuse attention maps from the
    previous block (calc_attn=False)."""
    channels: int
    shifts: int = 0
    window_sizes: Sequence[int] = (4, 8, 12)
    calc_attn: bool = True

    @nn.compact
    def __call__(self, x, prev_atns=None):
        b, h, w, c = x.shape
        if self.calc_attn:
            y = nn.Conv(c * 2, (1, 1))(x)
            y = nn.LayerNorm(epsilon=1e-5)(y)
            split = [c * 2 // 3] * 3
        else:
            y = nn.Conv(c, (1, 1))(x)
            y = nn.LayerNorm(epsilon=1e-5)(y)
            split = [c // 3] * 3
        xs = jnp.split(y, [split[0], split[0] + split[1]], axis=-1)
        ys, atns = [], []
        for idx, x_ in enumerate(xs):
            wsize = self.window_sizes[idx]
            if self.shifts > 0:
                x_ = jnp.roll(x_, (-wsize // 2, -wsize // 2), axis=(1, 2))
            if prev_atns is None:
                qv = _window_partition(x_, wsize)          # (bw, n, 2ch)
                ch = qv.shape[-1] // 2
                q, v = qv[..., :ch], qv[..., ch:]
                atn = jax.nn.softmax(
                    jnp.einsum("bnc,bmc->bnm", q, q), axis=-1)
                y_ = jnp.einsum("bnm,bmc->bnc", atn, v)
                atns.append(atn)
            else:
                v = _window_partition(x_, wsize)
                y_ = jnp.einsum("bnm,bmc->bnc", prev_atns[idx], v)
            y_ = _window_merge(y_, wsize, h, w)
            if self.shifts > 0:
                y_ = jnp.roll(y_, (wsize // 2, wsize // 2), axis=(1, 2))
            ys.append(y_)
        out = nn.Conv(c, (1, 1))(jnp.concatenate(ys, axis=-1))
        return out, (atns if prev_atns is None else prev_atns)


class ELAB(nn.Module):
    channels: int
    exp_ratio: int = 2
    shifts: int = 0
    window_sizes: Sequence[int] = (4, 8, 12)
    shared_depth: int = 1

    @nn.compact
    def __call__(self, x):
        atn = None
        for i in range(1 + self.shared_depth):
            x = LFE(self.channels, self.exp_ratio, name=f"lfe_{i}")(x) + x
            y, atn = GMSA(self.channels, self.shifts, self.window_sizes,
                          calc_attn=(i == 0), name=f"gmsa_{i}")(x, atn)
            x = y + x
        return x


@ARCH_REGISTRY.register()
class ELAN(nn.Module):
    """ELAN generator (reference elan_arch.py:237-320)."""
    scale: int = 4
    img_range: float = 255.0
    colors: int = 3
    window_sizes: Sequence[int] = (4, 8, 16)
    m_elan: int = 36
    c_elan: int = 180
    n_share: int = 0
    r_expand: int = 2
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)

    def window_lcm(self) -> int:
        wsize = self.window_sizes[0]
        for v in self.window_sizes[1:]:
            wsize = wsize * v // math.gcd(wsize, v)
        return wsize

    @nn.compact
    def __call__(self, x):
        h0, w0 = x.shape[1], x.shape[2]
        wsize = self.window_lcm()
        ph = (wsize - h0 % wsize) % wsize
        pw = (wsize - w0 % wsize) % wsize
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        mean = jnp.asarray(self.rgb_mean)
        x = (x - mean) * self.img_range
        feat = nn.Conv(self.c_elan, (3, 3), padding="SAME", name="head")(x)
        res = feat
        for i in range(self.m_elan // (1 + self.n_share)):
            res = ELAB(self.c_elan, self.r_expand, shifts=(i % 2),
                       window_sizes=self.window_sizes, shared_depth=self.n_share,
                       name=f"body_{i}")(res)
        res = res + feat
        if self.scale != 1:
            out = nn.Conv(self.colors * self.scale ** 2, (3, 3), padding="SAME", name="tail")(res)
            out = pixel_shuffle(out, self.scale)
        else:
            out = nn.Conv(self.colors, (3, 3), padding="SAME", name="tail")(res)
        out = out / self.img_range + mean
        return out[:, : h0 * self.scale, : w0 * self.scale, :]
