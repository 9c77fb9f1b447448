"""SPSR — Structure-Preserving Super-Resolution, dual-branch generator.

Reference parity: archs/spsr_arch.py:290-438 (SPSRNet: RRDB trunk with
feature taps every 5 blocks feeding a gradient branch; returns
(grad_branch_sr, sr, input_gradient)) and :261 (Get_gradient_nopadding).
NHWC flax re-design; nb must be a multiple of 5 + >=21 blocks like the
reference's tap points (taps at 5/10/15/20)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.arch_util import resize_nearest
from ssl_tpu.archs.rrdbnet_arch import RRDB
from ssl_tpu.utils.registry import ARCH_REGISTRY


def image_gradient(x: jnp.ndarray) -> jnp.ndarray:
    """Per-channel Sobel-like central-difference magnitude
    (reference Get_gradient_nopadding :261-287). NHWC."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gv = xp[:, 2:, 1:-1, :] - xp[:, :-2, 1:-1, :]
    gh = xp[:, 1:-1, 2:, :] - xp[:, 1:-1, :-2, :]
    return jnp.sqrt(gv ** 2 + gh ** 2 + 1e-6)


class _UpConv(nn.Module):
    nf: int

    @nn.compact
    def __call__(self, x):
        x = resize_nearest(x, 2)
        return nn.leaky_relu(nn.Conv(self.nf, (3, 3), padding="SAME")(x), 0.2)


@ARCH_REGISTRY.register()
class SPSRNet(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    # NOTE: the reference hardcodes gc=32 in every RRDB (spsr_arch.py:301,
    # 328-340,365) — its `gc` ctor arg is dead; field kept for config compat
    gc: int = 32
    upscale: int = 4

    @nn.compact
    def __call__(self, x):
        import math
        n_up = int(math.log2(self.upscale))
        x_grad = image_gradient(x)

        feat = nn.Conv(self.nf, (3, 3), padding="SAME", name="fea_conv")(x)
        taps = {}
        h = feat
        for i in range(self.nb):
            h = RRDB(self.nf, 32, name=f"rb_{i}")(h)
            if i + 1 in (5, 10, 15, 20):
                taps[i + 1] = h
        h = nn.Conv(self.nf, (3, 3), padding="SAME", name="LR_conv")(h)
        h = feat + h  # trunk shortcut
        for u in range(n_up):
            h = _UpConv(self.nf, name=f"up_{u}")(h)
        h = nn.leaky_relu(nn.Conv(self.nf, (3, 3), padding="SAME", name="HR_conv0")(h), 0.2)
        h = nn.Conv(self.nf, (3, 3), padding="SAME", name="HR_conv1")(h)

        # gradient branch, fed by trunk taps
        b = nn.Conv(self.nf, (3, 3), padding="SAME", name="b_fea_conv")(x_grad)
        cat = b
        for k, tap_i in enumerate((5, 10, 15, 20), start=1):
            cat = jnp.concatenate([cat, taps[tap_i]], axis=-1)
            cat = RRDB(self.nf * 2, 32, name=f"b_block_{k}")(cat)
            cat = nn.Conv(self.nf, (3, 3), padding="SAME", name=f"b_concat_{k}")(cat)
        cat = nn.Conv(self.nf, (3, 3), padding="SAME", name="b_LR_conv")(cat)
        cat = cat + b
        for u in range(n_up):
            cat = _UpConv(self.nf, name=f"b_up_{u}")(cat)
        cat = nn.leaky_relu(nn.Conv(self.nf, (3, 3), padding="SAME", name="b_HR_conv0")(cat), 0.2)
        x_branch = nn.Conv(self.nf, (3, 3), padding="SAME", name="b_HR_conv1")(cat)
        x_out_branch = nn.Conv(self.out_nc, (1, 1), name="conv_w")(x_branch)

        # fusion
        f = jnp.concatenate([x_branch, h], axis=-1)
        f = RRDB(self.nf * 2, 32, name="f_block")(f)
        f = nn.Conv(self.nf, (3, 3), padding="SAME", name="f_concat")(f)
        f = nn.leaky_relu(nn.Conv(self.nf, (3, 3), padding="SAME", name="f_HR_conv0")(f), 0.2)
        x_out = nn.Conv(self.out_nc, (3, 3), padding="SAME", name="f_HR_conv1")(f)

        return x_out_branch, x_out, x_grad
