"""HiFaceGAN — face renovation with suppression-and-replenishment.

Reference parity: diffusion-tree vendored basicsr archs/hifacegan_arch.py
(compact): a content-adaptive suppression pyramid (LIP-style softmax-gated
pooling) + SPADE-conditioned replenishment decoder.  BasicSR inheritance, not
on the SSL path.  (DFDNet is NOT reimplemented — it requires external facial
part dictionaries; documented out-of-scope in STATUS.md.)"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.utils.registry import ARCH_REGISTRY


class _SoftGate(nn.Module):
    """LIP: learned importance pooling gate."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        logit = nn.Conv(c, (3, 3), padding="SAME")(x)
        w = jnp.exp(jnp.clip(logit, -10, 10))
        num = nn.avg_pool(x * w, (2, 2), strides=(2, 2))
        den = nn.avg_pool(w, (2, 2), strides=(2, 2))
        return num / (den + 1e-8)


class _SPADE(nn.Module):
    """Spatially-adaptive denormalization conditioned on a guidance map."""
    num_feat: int

    @nn.compact
    def __call__(self, x, guide):
        if guide.shape[1] != x.shape[1]:
            guide = jax.image.resize(guide, (guide.shape[0], x.shape[1], x.shape[2],
                                             guide.shape[-1]), "nearest")
        normed = nn.GroupNorm(num_groups=min(32, x.shape[-1]), use_bias=False,
                              use_scale=False)(x)
        h = nn.relu(nn.Conv(128, (3, 3), padding="SAME")(guide))
        gamma = nn.Conv(x.shape[-1], (3, 3), padding="SAME")(h)
        beta = nn.Conv(x.shape[-1], (3, 3), padding="SAME")(h)
        return normed * (1 + gamma) + beta


class _SPADEResBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, guide):
        mid = min(x.shape[-1], self.out_ch)
        y = _SPADE(mid)(x, guide)
        y = nn.Conv(mid, (3, 3), padding="SAME")(nn.leaky_relu(y, 0.2))
        y = _SPADE(mid)(y, guide)
        y = nn.Conv(self.out_ch, (3, 3), padding="SAME")(nn.leaky_relu(y, 0.2))
        skip = x if x.shape[-1] == self.out_ch else nn.Conv(self.out_ch, (1, 1))(x)
        return skip + y


@ARCH_REGISTRY.register()
class HiFaceGAN(nn.Module):
    """Compact HiFaceGAN: n-level suppression encoder + SPADE decoder."""
    num_feat: int = 48
    num_levels: int = 3

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # suppression pyramid (guides)
        guides = [x]
        feat = nn.leaky_relu(nn.Conv(self.num_feat, (3, 3), padding="SAME",
                                     name="enc_first")(x), 0.2)
        for i in range(self.num_levels):
            feat = _SoftGate(name=f"gate_{i}")(feat)
            feat = nn.leaky_relu(nn.Conv(self.num_feat * (2 ** min(i + 1, 3)), (3, 3),
                                         padding="SAME", name=f"enc_{i}")(feat), 0.2)
            guides.append(feat)
        # replenishment decoder
        y = feat
        for i in reversed(range(self.num_levels)):
            y = _SPADEResBlock(self.num_feat * (2 ** min(i, 3)),
                               name=f"spade_{i}")(y, guides[i + 1])
            bb, hh, ww, cc = y.shape
            y = jax.image.resize(y, (bb, hh * 2, ww * 2, cc), "nearest")
        y = _SPADEResBlock(self.num_feat, name="spade_out")(y, x)
        out = nn.Conv(3, (3, 3), padding="SAME", name="conv_out")(nn.leaky_relu(y, 0.2))
        return jnp.tanh(out) * 0.5 + 0.5
