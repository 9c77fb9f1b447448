"""Architecture building blocks (flax.linen, NHWC).

Reference parity target: basicsr/archs/arch_util.py (make_layer,
default_init_weights, pixel_unshuffle). DCNv2 (arch_util.py:205) is only used
by video archs the SSL paper never trains and is out of scope per SURVEY §2.1."""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def scaled_kaiming_init(scale: float = 1.0, mode: str = "fan_in"):
    """Kaiming-normal init scaled by `scale` — the reference's
    default_init_weights(scale=0.1) residual-friendly init."""
    def init(key, shape, dtype=jnp.float32):
        # variance_scaling multiplies variance; reference scales std by `scale`
        w = jax.nn.initializers.variance_scaling(2.0, mode, "normal")(key, shape, dtype)
        return w * scale
    return init


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Depth-to-space, NHWC. (b,h,w,c*s^2) -> (b,h*s,w*s,c).

    Channel layout matches torch.nn.PixelShuffle — index = c*s^2 + dy*s + dx —
    so converted checkpoints whose convs feed a pixel-shuffle (MSRResNet
    upconv, SRVGG upsampler, SwinIR pixelshuffle tail) need no channel
    permutation.  (Caught by the reference-oracle parity suite: the earlier
    (dy,dx,c) layout produced column-interleaved outputs.)"""
    b, h, w, c = x.shape
    oc = c // (scale * scale)
    x = x.reshape(b, h, w, oc, scale, scale)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * scale, w * scale, oc)


def pixel_unshuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Space-to-depth, NHWC. (b,h*s,w*s,c) -> (b,h,w,c*s^2).

    Channel ordering matches torch pixel_unshuffle (reference arch_util.py:301):
    out channel = c * s^2 ordering with (c, sh, sw) major-to-minor."""
    b, hs, ws, c = x.shape
    h, w = hs // scale, ws // scale
    x = x.reshape(b, h, scale, w, scale, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # b,h,w,c,sh,sw
    return x.reshape(b, h, w, c * scale * scale)


def resize_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Nearest-neighbor x`scale` upsample, NHWC (matches F.interpolate nearest)."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def resize_bilinear(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bilinear x`scale` upsample, NHWC — matches torch
    F.interpolate(mode='bilinear', align_corners=False) (half-pixel centers,
    same convention as jax.image.resize)."""
    import jax
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * scale, w * scale, c), method="bilinear")


class Conv3x3(nn.Module):
    """3x3 same conv with optionally scaled init (residual blocks use 0.1).

    ``dtype`` = compute dtype (params stay fp32 — flax param_dtype default)."""
    features: int
    init_scale: float = 1.0
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), padding="SAME", use_bias=self.use_bias,
                       kernel_init=scaled_kaiming_init(self.init_scale),
                       dtype=self.dtype)(x)


class ResidualBlockNoBN(nn.Module):
    """conv-relu-conv residual block without BN (reference arch_util.py:44-75)."""
    num_feat: int = 64
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        identity = x
        out = Conv3x3(self.num_feat, init_scale=0.1)(x)
        out = nn.relu(out)
        out = Conv3x3(self.num_feat, init_scale=0.1)(out)
        return identity + out * self.res_scale


class Upsample(nn.Module):
    """Pixel-shuffle upsampler for 2^n / 3 scales (reference arch_util.py:78-100)."""
    scale: int
    num_feat: int

    @nn.compact
    def __call__(self, x):
        scale = self.scale
        if (scale & (scale - 1)) == 0:  # power of 2
            import math
            for _ in range(int(math.log2(scale))):
                x = nn.Conv(4 * self.num_feat, (3, 3), padding="SAME")(x)
                x = pixel_shuffle(x, 2)
        elif scale == 3:
            x = nn.Conv(9 * self.num_feat, (3, 3), padding="SAME")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f"scale {scale} is not supported. Supported scales: 2^n and 3.")
        return x


def make_layer(block_cls: Callable, num_blocks: int, **kwargs):
    """Return a list of `num_blocks` module instances (applied sequentially)."""
    return [block_cls(**kwargs) for _ in range(num_blocks)]


def spectral_norm_conv(features: int, kernel_size, strides=1, padding="SAME", use_bias=True):
    """Conv wrapped in spectral normalization (power iteration, 1 step/call)."""
    return nn.SpectralNorm(nn.Conv(features, kernel_size, strides=strides,
                                   padding=padding, use_bias=use_bias))
