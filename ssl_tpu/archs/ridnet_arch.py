"""RIDNet — real image denoising with feature attention.

Reference parity: diffusion-tree vendored basicsr archs/ridnet_arch.py
(BasicSR inheritance, not on the SSL path).  NHWC flax compact version:
EAM blocks (merge-and-run dilated pairs -> residual block -> enhanced residual
block -> channel attention)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.utils.registry import ARCH_REGISTRY


def _conv(x, feats, k=3, dilation=1, name=None):
    pad = dilation * (k // 2)
    return nn.Conv(feats, (k, k), kernel_dilation=(dilation, dilation),
                   padding=((pad, pad), (pad, pad)), name=name)(x)


class _EAM(nn.Module):
    num_feat: int

    @nn.compact
    def __call__(self, x):
        relu = nn.relu
        # merge-and-run dual dilated branches
        a = relu(_conv(relu(_conv(x, self.num_feat, dilation=1)), self.num_feat, dilation=2))
        b = relu(_conv(relu(_conv(x, self.num_feat, dilation=3)), self.num_feat, dilation=4))
        y = relu(_conv(jnp.concatenate([a, b], -1), self.num_feat))
        # residual block
        z = _conv(relu(_conv(y, self.num_feat)), self.num_feat)
        y = relu(y + z)
        # enhanced residual block
        z = relu(_conv(y, self.num_feat))
        z = relu(_conv(z, self.num_feat))
        z = _conv(z, self.num_feat, k=1)
        y = relu(y + z)
        # channel attention
        g = y.mean(axis=(1, 2), keepdims=True)
        g = relu(nn.Conv(max(self.num_feat // 16, 4), (1, 1))(g))
        g = jax.nn.sigmoid(nn.Conv(self.num_feat, (1, 1))(g))
        return x + y * g


@ARCH_REGISTRY.register()
class RIDNet(nn.Module):
    num_in_ch: int = 3
    num_feat: int = 64
    num_out_ch: int = 3
    num_block: int = 4

    @nn.compact
    def __call__(self, x):
        head = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="head")(x)
        y = head
        for i in range(self.num_block):
            y = _EAM(self.num_feat, name=f"eam_{i}")(y)
        out = nn.Conv(self.num_out_ch, (3, 3), padding="SAME", name="tail")(y)
        return x + out
