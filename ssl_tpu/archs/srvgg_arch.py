"""SRVGGNetCompact — compact VGG-style RealESRGAN net (reference: archs/srvgg_arch.py:7-70)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.arch_util import pixel_shuffle, resize_nearest
from ssl_tpu.utils.registry import ARCH_REGISTRY


class ChannelPReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C) parity; flax's
    nn.PReLU is a shared scalar, which can't carry ported checkpoints)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha * x)


@ARCH_REGISTRY.register()
class SRVGGNetCompact(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 16
    upscale: int = 4
    act_type: str = "prelu"

    def _act(self, x, name):
        if self.act_type == "relu":
            return nn.relu(x)
        if self.act_type == "prelu":
            return ChannelPReLU(name=name)(x)
        if self.act_type == "leakyrelu":
            return nn.leaky_relu(x, 0.1)
        raise ValueError(self.act_type)

    @nn.compact
    def __call__(self, x):
        feat = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_first")(x)
        feat = self._act(feat, "act_first")
        for i in range(self.num_conv):
            feat = nn.Conv(self.num_feat, (3, 3), padding="SAME", name=f"conv_{i}")(feat)
            feat = self._act(feat, f"act_{i}")
        feat = nn.Conv(self.num_out_ch * self.upscale ** 2, (3, 3), padding="SAME", name="conv_last")(feat)
        out = pixel_shuffle(feat, self.upscale)
        return out + resize_nearest(x, self.upscale)
