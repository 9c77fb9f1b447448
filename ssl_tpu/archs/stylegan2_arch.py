"""StyleGAN2 generator — TPU-native compact implementation.

Reference parity: the diffusion tree's vendored basicsr stylegan2_arch.py
(consumer of the fused_act/upfirdn2d native ops, SURVEY §2.1 N3/N4).  NHWC
flax: modulated convs are expressed as per-sample weight modulation via
einsum (MXU), resampling uses ops/stylegan_ops.upfirdn2d."""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ssl_tpu.ops.stylegan_ops import fused_leaky_relu, make_resample_kernel, upfirdn2d
from ssl_tpu.utils.registry import ARCH_REGISTRY


class EqualLinear(nn.Module):
    out_dim: int
    lr_mul: float = 1.0
    activation: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        w = self.param("weight", nn.initializers.normal(1.0 / self.lr_mul),
                       (in_dim, self.out_dim))
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        out = x @ (w * scale) + b * self.lr_mul
        if self.activation:
            out = fused_leaky_relu(out)
        return out


def _up2(x, resample: str):
    if resample == "bilinear":
        b, h, w, c = x.shape
        return jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")
    return upfirdn2d(x, jnp.asarray(make_resample_kernel((1, 3, 3, 1)) * 4),
                     up=2, down=1, pad=(2, 1))


class ModulatedConv(nn.Module):
    out_ch: int
    kernel: int
    demodulate: bool = True
    upsample: bool = False
    resample: str = "fir"

    @nn.compact
    def __call__(self, x, style):
        b, h, w_sp, cin = x.shape
        k = self.kernel
        scale = 1.0 / math.sqrt(cin * k * k)
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, cin, self.out_ch))
        s = EqualLinear(cin, name="modulation")(style) + 1.0     # (b, cin)
        wmod = weight[None] * s[:, None, None, :, None] * scale  # (b,k,k,cin,cout)
        if self.demodulate:
            demod = jax.lax.rsqrt(jnp.sum(wmod ** 2, axis=(1, 2, 3)) + 1e-8)
            wmod = wmod * demod[:, None, None, None, :]
        if self.upsample:
            x = _up2(x, self.resample)
        # per-sample conv via batched im2col einsum
        pad = k // 2
        xp = jnp.pad(x if not self.upsample else x,
                     ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        patches = jax.lax.conv_general_dilated_patches(
            xp.transpose(0, 3, 1, 2), (k, k), (1, 1), "VALID")
        hh, ww = patches.shape[2], patches.shape[3]
        patches = patches.reshape(b, cin, k, k, hh, ww)
        out = jnp.einsum("bckluv,bklco->buvo", patches, wmod,
                         preferred_element_type=jnp.float32)
        return out


class StyleConv(nn.Module):
    out_ch: int
    kernel: int = 3
    upsample: bool = False
    resample: str = "fir"

    @nn.compact
    def __call__(self, x, style, noise=None):
        out = ModulatedConv(self.out_ch, self.kernel, upsample=self.upsample,
                            resample=self.resample)(x, style)
        if noise is None:
            noise = jnp.zeros(out.shape[:3] + (1,))
        noise_w = self.param("noise_weight", nn.initializers.zeros, ())
        out = out + noise_w * noise
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return fused_leaky_relu(out, bias)


class ToRGB(nn.Module):
    upsample: bool = True
    resample: str = "fir"

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv(3, 1, demodulate=False)(x, style)
        out = out + self.param("bias", nn.initializers.zeros, (3,))
        if skip is not None:
            if self.upsample:
                skip = _up2(skip, self.resample)
            out = out + skip
        return out


@ARCH_REGISTRY.register()
class StyleGAN2Generator(nn.Module):
    out_size: int = 64
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 2
    resample: str = "fir"  # 'fir' (upfirdn2d) | 'bilinear' (stylegan2_bilinear_arch variant)

    def channels(self):
        base = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * self.channel_multiplier,
                128: 128 * self.channel_multiplier, 256: 64 * self.channel_multiplier,
                512: 32 * self.channel_multiplier, 1024: 16 * self.channel_multiplier}
        return base

    @nn.compact
    def __call__(self, styles, rng=None, input_is_latent: bool = False):
        """styles: (b, num_style_feat) z or w; returns (b, out_size, out_size, 3)."""
        ch = self.channels()
        w = styles
        if not input_is_latent:
            for i in range(self.num_mlp):
                w = EqualLinear(self.num_style_feat, lr_mul=0.01, activation=True,
                                name=f"style_mlp_{i}")(w)
        b = w.shape[0]
        log_size = int(math.log2(self.out_size))
        const = self.param("constant_input", nn.initializers.normal(1.0), (4, 4, ch[4]))
        x = jnp.broadcast_to(const, (b,) + const.shape)
        rs = self.resample
        x = StyleConv(ch[4], resample=rs, name="conv1")(x, w)
        skip = ToRGB(upsample=False, resample=rs, name="to_rgb1")(x, w)
        for i in range(3, log_size + 1):
            res = 2 ** i
            x = StyleConv(ch[res], upsample=True, resample=rs, name=f"conv_up_{res}")(x, w)
            x = StyleConv(ch[res], resample=rs, name=f"conv_{res}")(x, w)
            skip = ToRGB(resample=rs, name=f"to_rgb_{res}")(x, w, skip)
        return skip
