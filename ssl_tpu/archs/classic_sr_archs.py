"""Classic SR CNNs from the vendored BasicSR zoo (diffusion tree archs/):
EDSR (edsr_arch.py), RCAN (rcan_arch.py), ECBSR (ecbsr_arch.py — the
edge-oriented conv block re-parameterization net).  BasicSR inheritance, not
on any SSL training path; provided for capability parity.  NHWC flax."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.arch_util import Conv3x3, ResidualBlockNoBN, Upsample, pixel_shuffle
from ssl_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register()
class EDSR(nn.Module):
    """EDSR: mean-shifted residual CNN (reference edsr_arch.py)."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 4
    res_scale: float = 1.0
    img_range: float = 255.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean)
        x = (x - mean) * self.img_range
        feat = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_first")(x)
        body = feat
        for i in range(self.num_block):
            body = ResidualBlockNoBN(self.num_feat, res_scale=self.res_scale,
                                     name=f"body_{i}")(body)
        body = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_after_body")(body)
        feat = feat + body
        feat = Upsample(self.upscale, self.num_feat, name="upsample")(feat)
        out = nn.Conv(self.num_out_ch, (3, 3), padding="SAME", name="conv_last")(feat)
        return out / self.img_range + mean


class _CALayer(nn.Module):
    """Channel attention (squeeze-excite with sigmoid gate)."""
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.relu(nn.Conv(max(c // self.reduction, 4), (1, 1))(y))
        y = jax.nn.sigmoid(nn.Conv(c, (1, 1))(y))
        return x * y


class _RCAB(nn.Module):
    num_feat: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.num_feat, (3, 3), padding="SAME")(x)
        y = nn.relu(y)
        y = nn.Conv(self.num_feat, (3, 3), padding="SAME")(y)
        return x + _CALayer(self.reduction)(y)


class _ResidualGroup(nn.Module):
    num_feat: int
    num_block: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.num_block):
            y = _RCAB(self.num_feat, self.reduction, name=f"rcab_{i}")(y)
        y = nn.Conv(self.num_feat, (3, 3), padding="SAME")(y)
        return x + y


@ARCH_REGISTRY.register()
class RCAN(nn.Module):
    """Residual channel attention network (reference rcan_arch.py)."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_group: int = 10
    num_block: int = 20
    squeeze_factor: int = 16
    upscale: int = 4
    img_range: float = 255.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean)
        x = (x - mean) * self.img_range
        feat = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_first")(x)
        body = feat
        for g in range(self.num_group):
            body = _ResidualGroup(self.num_feat, self.num_block, self.squeeze_factor,
                                  name=f"group_{g}")(body)
        body = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_after_body")(body)
        feat = feat + body
        feat = Upsample(self.upscale, self.num_feat, name="upsample")(feat)
        out = nn.Conv(self.num_out_ch, (3, 3), padding="SAME", name="conv_last")(feat)
        return out / self.img_range + mean


class _ECB(nn.Module):
    """Edge-oriented conv block.  The reference trains parallel 3x3 +
    scaled-1x1 + sobel/laplacian branches and re-parameterizes to one conv at
    inference; on TPU XLA fuses the branch sum anyway, so the training-time
    multi-branch form is used directly (same function class)."""
    out_ch: int
    act: str = "prelu"

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv3x3")(x)
        y = y + nn.Conv(self.out_ch, (1, 1), name="conv1x1")(x)
        # fixed edge operators after a learned 1x1
        sobel_x = jnp.asarray([[1, 0, -1], [2, 0, -2], [1, 0, -1]], jnp.float32)
        lap = jnp.asarray([[0, 1, 0], [1, -4, 1], [0, 1, 0]], jnp.float32)
        z = nn.Conv(self.out_ch, (1, 1), name="conv1x1_sbx")(x)
        k = jnp.zeros((3, 3, self.out_ch, self.out_ch))
        for name, ker in (("sbx", sobel_x), ("lpl", lap)):
            w = self.param(f"scale_{name}", nn.initializers.ones, (self.out_ch,))
            kd = ker[:, :, None, None] * w[None, None, None, :]
            kd = kd * jnp.eye(self.out_ch)[None, None]
            z2 = jax.lax.conv_general_dilated(
                z, kd, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + z2
        if self.act == "prelu":
            from ssl_tpu.archs.srvgg_arch import ChannelPReLU
            return ChannelPReLU()(y)
        return y


@ARCH_REGISTRY.register()
class ECBSR(nn.Module):
    """Edge-oriented conv block SR net (reference ecbsr_arch.py)."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_block: int = 4
    num_channel: int = 16
    upscale: int = 4

    @nn.compact
    def __call__(self, x):
        shortcut = jnp.repeat(x, self.upscale * self.upscale, axis=-1)
        y = _ECB(self.num_channel, name="ecb_first")(x)
        for i in range(self.num_block):
            y = _ECB(self.num_channel, name=f"ecb_{i}")(y)
        y = _ECB(self.num_out_ch * self.upscale ** 2, act="linear", name="ecb_last")(y)
        y = y + shortcut
        return pixel_shuffle(y, self.upscale)
