"""RIDNet — real image denoising with feature attention.

Full-fidelity NHWC flax rewrite of the diffusion-tree vendored
basicsr/archs/ridnet_arch.py (BasicSR inheritance, not on the SSL path),
with a weight converter (utils/weight_port.convert_ridnet) and an
oracle-parity test against the reference torch module."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.utils.registry import ARCH_REGISTRY


class MeanShift(nn.Module):
    """Learnable 1x1 conv initialized to (x - sign*range*mean)/std
    (reference ridnet_arch.py:8-28).  Carried as ordinary conv weights so
    converted checkpoints restore whatever values they trained to."""
    rgb_range: float = 255.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)
    rgb_std: Sequence[float] = (1.0, 1.0, 1.0)
    sign: int = -1

    @nn.compact
    def __call__(self, x):
        std = jnp.asarray(self.rgb_std)

        def kernel_init(key, shape, dtype=jnp.float32):
            return (jnp.eye(3) / std[:, None]).T[None, None].astype(dtype)

        def bias_init(key, shape, dtype=jnp.float32):
            return (self.sign * self.rgb_range * jnp.asarray(self.rgb_mean) / std).astype(dtype)

        return nn.Conv(3, (1, 1), kernel_init=kernel_init, bias_init=bias_init,
                       name="conv")(x)


def _conv(x, feats, k=3, dilation=1, name=None):
    pad = dilation * (k // 2)
    return nn.Conv(feats, (k, k), kernel_dilation=(dilation, dilation),
                   padding=((pad, pad), (pad, pad)), name=name)(x)


class _EAM(nn.Module):
    """Enhancement attention module (ridnet_arch.py:106-134): merge-and-run
    (has its own +x), then relu(ResidualBlockNoBN), then enhanced residual
    block, then channel attention.  NOTE: no outer residual add — the EAM
    output IS the CA-gated feature."""
    num_feat: int

    @nn.compact
    def __call__(self, x):
        relu = nn.relu
        # MergeRun (ridnet_arch.py:55-84): two dilated chains, concat, 3x3, +x
        a = relu(_conv(relu(_conv(x, self.num_feat, dilation=1, name="d1_0")),
                       self.num_feat, dilation=2, name="d1_1"))
        b = relu(_conv(relu(_conv(x, self.num_feat, dilation=3, name="d2_0")),
                       self.num_feat, dilation=4, name="d2_1"))
        y = relu(_conv(jnp.concatenate([a, b], -1), self.num_feat, name="agg"))
        y = y + x
        # ResidualBlockNoBN (+ relu AFTER the addition, ridnet_arch.py:131)
        z = _conv(relu(_conv(y, self.num_feat, name="b1_0")), self.num_feat, name="b1_1")
        y = relu(y + z)
        # EResidualBlockNoBN (ridnet_arch.py:31-52): conv3-relu-conv3-relu-conv1, relu(out+x)
        z = relu(_conv(y, self.num_feat, name="b2_0"))
        z = relu(_conv(z, self.num_feat, name="b2_1"))
        z = _conv(z, self.num_feat, k=1, name="b2_2")
        y = relu(y + z)
        # channel attention (exact squeeze width num_feat//16)
        g = y.mean(axis=(1, 2), keepdims=True)
        g = relu(nn.Conv(self.num_feat // 16, (1, 1), name="ca_down")(g))
        g = jax.nn.sigmoid(nn.Conv(self.num_feat, (1, 1), name="ca_up")(g))
        return y * g


@ARCH_REGISTRY.register()
class RIDNet(nn.Module):
    """RIDNet (reference ridnet_arch.py:137-180): mean-shift, head conv +
    relu, EAM chain, tail conv, add-mean, global input residual."""
    num_in_ch: int = 3
    num_feat: int = 64
    num_out_ch: int = 3
    num_block: int = 4
    img_range: float = 255.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)
    rgb_std: Sequence[float] = (1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, x):
        res = MeanShift(self.img_range, self.rgb_mean, self.rgb_std, -1,
                        name="sub_mean")(x)
        y = nn.relu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="head")(res))
        for i in range(self.num_block):
            y = _EAM(self.num_feat, name=f"eam_{i}")(y)
        out = nn.Conv(self.num_out_ch, (3, 3), padding="SAME", name="tail")(y)
        out = MeanShift(self.img_range, self.rgb_mean, self.rgb_std, 1,
                        name="add_mean")(out)
        return x + out
