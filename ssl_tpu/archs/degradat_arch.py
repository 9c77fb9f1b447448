"""DEResNet — degradation estimator (reference: vendored degradat_arch.py:90).

ResNet-noBN stages estimating per-degradation degree maps (blur + noise)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.arch_util import ResidualBlockNoBN
from ssl_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register()
class DEResNet(nn.Module):
    num_in_ch: int = 3
    num_degradation: int = 2
    degradation_degree_actv: str = "sigmoid"
    num_feats: Sequence[int] = (64, 128, 256, 512)
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    downscales: Sequence[int] = (2, 2, 2, 1)

    @nn.compact
    def __call__(self, x):
        feat = x
        for stage, (f, nb, ds) in enumerate(zip(self.num_feats, self.num_blocks,
                                                self.downscales)):
            feat = nn.Conv(f, (3, 3), padding="SAME", name=f"stage{stage}_conv")(feat)
            for i in range(nb):
                feat = ResidualBlockNoBN(f, name=f"stage{stage}_block{i}")(feat)
            if ds > 1:
                feat = nn.avg_pool(feat, (ds, ds), strides=(ds, ds))
        # per-degradation degree heads (global map -> scalar per degradation)
        outs = []
        for d in range(self.num_degradation):
            y = nn.Conv(1, (3, 3), padding="SAME", name=f"head_{d}")(feat)
            y = y.mean(axis=(1, 2, 3))
            if self.degradation_degree_actv == "sigmoid":
                y = jax.nn.sigmoid(y)
            elif self.degradation_degree_actv == "tanh":
                y = jnp.tanh(y)
            outs.append(y)
        return jnp.stack(outs, axis=-1)  # (b, num_degradation)
