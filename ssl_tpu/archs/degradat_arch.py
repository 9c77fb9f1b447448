"""DEResNet — degradation estimator (reference: vendored degradat_arch.py).

Full-fidelity NHWC flax rewrite: per-degradation ResNet-noBN branches
(strided-conv downscales), global average pool, 2-layer FC degree head with
sigmoid/tanh.  Converter: utils/weight_port.convert_deresnet; oracle-parity
test in tests/test_reference_parity_zoo.py."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.arch_util import ResidualBlockNoBN
from ssl_tpu.utils.registry import ARCH_REGISTRY


def deresnet_body_layout(num_feats, num_blocks, downscales):
    """Mirror of the reference body construction (degradat_arch.py:40-54):
    returns a list of ('block', feat) / ('conv', out_feat, stride) in torch
    Sequential order."""
    layout = []
    n = len(num_feats)
    for stage in range(n):
        for _ in range(num_blocks[stage]):
            layout.append(("block", num_feats[stage]))
        if downscales[stage] == 1:
            if stage < n - 1 and num_feats[stage] != num_feats[stage + 1]:
                layout.append(("conv", num_feats[stage + 1], 1))
        elif downscales[stage] == 2:
            layout.append(("conv", num_feats[min(stage + 1, n - 1)], 2))
        else:
            raise NotImplementedError
    return layout


@ARCH_REGISTRY.register()
class DEResNet(nn.Module):
    """Degradation estimator (degradat_arch.py:7-90).
    x (b,h,w,3) -> (b, num_degradation) degrees in (0,1) (sigmoid) / (-1,1)."""
    num_in_ch: int = 3
    num_degradation: int = 2
    degradation_degree_actv: str = "sigmoid"
    num_feats: Sequence[int] = (64, 128, 256, 512)
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    downscales: Sequence[int] = (2, 2, 2, 1)

    @nn.compact
    def __call__(self, x):
        layout = deresnet_body_layout(self.num_feats, self.num_blocks,
                                      self.downscales)
        outs = []
        for d in range(self.num_degradation):
            feat = nn.Conv(self.num_feats[0], (3, 3), padding="SAME",
                           name=f"conv_first_{d}")(x)
            for j, item in enumerate(layout):
                if item[0] == "block":
                    feat = ResidualBlockNoBN(item[1],
                                             name=f"body_{d}_{j}")(feat)
                else:
                    _, f_out, s = item
                    feat = nn.Conv(f_out, (3, 3), strides=(s, s),
                                   padding=((1, 1), (1, 1)),
                                   name=f"body_{d}_{j}")(feat)
            feat = feat.mean(axis=(1, 2))                     # global avg pool
            y = nn.relu(nn.Dense(512, name=f"fc_{d}_0")(feat))
            y = nn.Dense(1, name=f"fc_{d}_1")(y)
            if self.degradation_degree_actv == "sigmoid":
                y = jax.nn.sigmoid(y)
            elif self.degradation_degree_actv == "tanh":
                y = jnp.tanh(y)
            else:
                raise NotImplementedError(self.degradation_degree_actv)
            outs.append(y[:, 0])
        return jnp.stack(outs, axis=-1)                       # (b, num_deg)
