"""Classic SR CNNs from the vendored BasicSR zoo (diffusion tree archs/):
EDSR (edsr_arch.py), RCAN (rcan_arch.py), ECBSR (ecbsr_arch.py — the
edge-oriented conv block re-parameterization net).  BasicSR inheritance, not
on any SSL training path; full-fidelity NHWC flax rewrites with weight
converters (utils/weight_port.py) and oracle-parity tests against the
reference torch modules (tests/test_reference_parity_zoo.py)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from ssl_tpu.archs.arch_util import ResidualBlockNoBN, Upsample, pixel_shuffle
from ssl_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register()
class EDSR(nn.Module):
    """EDSR: mean-shifted residual CNN (reference edsr_arch.py:9-61)."""
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
    """Channel attention (reference rcan_arch.py:8-24): global average pool,
    1x1 squeeze to EXACTLY num_feat//squeeze_factor, relu, 1x1 expand,
    sigmoid gate."""
    num_feat: int
    squeeze_factor: int = 16

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.relu(nn.Conv(self.num_feat // self.squeeze_factor, (1, 1), name="down")(y))
        y = jax.nn.sigmoid(nn.Conv(self.num_feat, (1, 1), name="up")(y))
        return x * y


class _RCAB(nn.Module):
    """Residual channel attention block (rcan_arch.py:27-46):
    x + res_scale * CA(conv(relu(conv(x))))."""
    num_feat: int
    squeeze_factor: int = 16
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv2")(y)
        y = _CALayer(self.num_feat, self.squeeze_factor, name="ca")(y)
        return x + y * self.res_scale


class _ResidualGroup(nn.Module):
    num_feat: int
    num_block: int
    squeeze_factor: int = 16
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.num_block):
            y = _RCAB(self.num_feat, self.squeeze_factor, self.res_scale,
                      name=f"rcab_{i}")(y)
        y = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv")(y)
        return x + y


@ARCH_REGISTRY.register()
class RCAN(nn.Module):
    """Residual channel attention network (reference rcan_arch.py:71-135)."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_group: int = 10
    num_block: int = 16
    squeeze_factor: int = 16
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
        for g in range(self.num_group):
            body = _ResidualGroup(self.num_feat, self.num_block, self.squeeze_factor,
                                  self.res_scale, name=f"group_{g}")(body)
        body = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_after_body")(body)
        feat = feat + body
        feat = Upsample(self.upscale, self.num_feat, name="upsample")(feat)
        out = nn.Conv(self.num_out_ch, (3, 3), padding="SAME", name="conv_last")(feat)
        return out / self.img_range + mean


# ---------------------------------------------------------------------------
# ECBSR (reference ecbsr_arch.py) — faithful multi-branch form
# ---------------------------------------------------------------------------
def _bias_pad(y0: jnp.ndarray, b0: jnp.ndarray) -> jnp.ndarray:
    """Pad a feature map by 1 with the conv BIAS value on the border — the
    reference SeqConv3x3 'explicitly padding with bias' quirk
    (ecbsr_arch.py:108-126): equivalent to zero-padding the INPUT of the 1x1
    conv, so the following 3x3 sees bias (not zero) outside the image."""
    b, h, w, c = y0.shape
    yp = jnp.pad(y0, ((0, 0), (1, 1), (1, 1), (0, 0)))
    border = jnp.ones((h + 2, w + 2), jnp.float32)
    border = border.at[1:-1, 1:-1].set(0.0)
    return yp * (1.0 - border)[None, :, :, None] + b0 * border[None, :, :, None]


# fixed edge-operator masks (ecbsr_arch.py:50-101), HW layout.
# numpy on purpose: device constants at import time would initialize the XLA
# backend before jax.distributed.initialize() can run (multi-host CLIs)
import numpy as _np
_SOBEL_X = _np.asarray([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]], _np.float32)
_SOBEL_Y = _np.asarray([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]], _np.float32)
_LAPLACIAN = _np.asarray([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], _np.float32)


class _SeqConvEdge(nn.Module):
    """conv1x1 -> bias-pad -> fixed-mask depthwise 3x3 scaled by a learned
    per-channel scale (+ learned bias).  seq_type conv1x1-sobelx/-sobely/
    -laplacian (ecbsr_arch.py:38-101,118-128)."""
    out_ch: int
    mask: jnp.ndarray

    @nn.compact
    def __call__(self, x):
        # the reference shares b0 between the 1x1 conv and the border padding;
        # keep one source of truth (bias-less conv + explicit b0 add)
        b0 = self.param("b0_pad", nn.initializers.zeros, (self.out_ch,))
        y0 = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv0_w")(x) + b0
        yp = _bias_pad(y0, b0)
        scale = self.param("scale", nn.initializers.normal(1e-3), (self.out_ch,))
        bias = self.param("bias", nn.initializers.normal(1e-3), (self.out_ch,))
        kernel = (self.mask[:, :, None] * scale[None, None, :])[:, :, None, :]  # (3,3,1,out)
        y1 = lax.conv_general_dilated(
            yp, kernel, (1, 1), "VALID", feature_group_count=self.out_ch,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y1 + bias


class _SeqConv1x1_3x3(nn.Module):
    """conv1x1 (expand to out*depth_multiplier) -> bias-pad -> 3x3 VALID
    (ecbsr_arch.py:28-36,106-117)."""
    out_ch: int
    depth_multiplier: float = 2.0

    @nn.compact
    def __call__(self, x):
        mid = int(self.out_ch * self.depth_multiplier)
        b0 = self.param("b0_pad", nn.initializers.zeros, (mid,))
        y0 = nn.Conv(mid, (1, 1), use_bias=False, name="conv0_w")(x) + b0
        yp = _bias_pad(y0, b0)
        return nn.Conv(self.out_ch, (3, 3), padding="VALID", name="conv1")(yp)


class _ChannelPReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha * x)


class _ECB(nn.Module):
    """Edge-oriented conv block, training-time multi-branch form
    (ecbsr_arch.py:156-212).  The torch eval path collapses the branches into
    one reparameterized 3x3 — an exact algebraic identity, so the parity test
    doubles as a check of the reference's own rep_params()."""
    out_ch: int
    depth_multiplier: float = 2.0
    act_type: str = "prelu"
    with_idt: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv3x3")(x)
        y = y + _SeqConv1x1_3x3(self.out_ch, self.depth_multiplier, name="conv1x1_3x3")(x)
        y = y + _SeqConvEdge(self.out_ch, _SOBEL_X, name="conv1x1_sbx")(x)
        y = y + _SeqConvEdge(self.out_ch, _SOBEL_Y, name="conv1x1_sby")(x)
        y = y + _SeqConvEdge(self.out_ch, _LAPLACIAN, name="conv1x1_lpl")(x)
        if self.with_idt and x.shape[-1] == self.out_ch:
            y = y + x
        if self.act_type == "prelu":
            return _ChannelPReLU(name="act")(y)
        if self.act_type == "relu":
            return nn.relu(y)
        if self.act_type == "softplus":
            return jax.nn.softplus(y)
        if self.act_type == "linear":
            return y
        raise ValueError(f"act_type {self.act_type} not supported")


@ARCH_REGISTRY.register()
class ECBSR(nn.Module):
    """Edge-oriented conv block SR net (reference ecbsr_arch.py:235-275)."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_block: int = 4
    num_channel: int = 16
    with_idt: bool = False
    act_type: str = "prelu"
    scale: int = 4

    @nn.compact
    def __call__(self, x):
        s2 = self.scale * self.scale
        if self.num_in_ch > 1:
            # torch repeat_interleave(dim=1): each channel repeated s^2 times
            shortcut = jnp.repeat(x, s2, axis=-1)
        else:
            shortcut = x
        y = _ECB(self.num_channel, 2.0, self.act_type, self.with_idt,
                 name="backbone_0")(x)
        for i in range(self.num_block):
            y = _ECB(self.num_channel, 2.0, self.act_type, self.with_idt,
                     name=f"backbone_{i + 1}")(y)
        y = _ECB(self.num_out_ch * s2, 2.0, "linear", self.with_idt,
                 name=f"backbone_{self.num_block + 1}")(y)
        y = y + shortcut
        return pixel_shuffle(y, self.scale)
