"""Remaining video-SR zoo members: TOF and DUF.

Reference parity: diffusion-tree vendored basicsr tof_arch.py (TOFlow:
task-oriented flow alignment + fusion CNN) and duf_arch.py (dynamic
upsampling filters via 3D convs).  BasicSR inheritance, not on the SSL path.
NHWC(+T) flax."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.basicvsr_arch import SPyNet, flow_warp
from ssl_tpu.archs.arch_util import pixel_shuffle
from ssl_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register()
class TOFlow(nn.Module):
    """Task-oriented flow video SR (reference tof_arch.py): warp neighbors to
    the center frame with learned flow, fuse with a small CNN.
    lqs (b,t,h,w,3) -> center frame (b,h,w,3) (TOF operates on pre-upscaled
    input like the reference)."""
    num_frame: int = 7
    spynet_levels: int = 3

    @nn.compact
    def __call__(self, lqs):
        b, t, h, w, c = lqs.shape
        center = t // 2
        ref = lqs[:, center]
        spynet = SPyNet(self.spynet_levels, name="spynet")
        warped = []
        for i in range(t):
            if i == center:
                warped.append(ref)
            else:
                flow = spynet(ref, lqs[:, i])
                warped.append(flow_warp(lqs[:, i], flow))
        x = jnp.concatenate(warped, axis=-1)
        x = nn.relu(nn.Conv(64, (9, 9), padding="SAME", name="conv1")(x))
        x = nn.relu(nn.Conv(32, (9, 9), padding="SAME", name="conv2")(x))
        x = nn.relu(nn.Conv(16, (1, 1), name="conv3")(x))
        out = nn.Conv(3, (1, 1), name="conv4")(x)
        return out + ref


@ARCH_REGISTRY.register()
class DUF(nn.Module):
    """Dynamic upsampling filters (reference duf_arch.py, compact): a 3D-conv
    stack predicts per-pixel 5x5 upsampling filters + residuals.
    lqs (b,t,h,w,3) -> center frame SR (b, s*h, s*w, 3)."""
    scale: int = 4
    num_feat: int = 32
    num_block: int = 4
    filter_size: int = 5

    @nn.compact
    def __call__(self, lqs):
        b, t, h, w, c = lqs.shape
        s = self.scale
        fs = self.filter_size
        # 3D feature stack (conv over (t,h,w))
        x = lqs
        x = nn.Conv(self.num_feat, (3, 3, 3), padding="SAME", name="conv3d_first")(x)
        for i in range(self.num_block):
            y = nn.relu(nn.Conv(self.num_feat, (3, 3, 3), padding="SAME",
                                name=f"dense_{i}_a")(x))
            y = nn.Conv(self.num_feat, (3, 3, 3), padding="SAME", name=f"dense_{i}_b")(y)
            x = x + y
        feat = x.mean(axis=1)  # temporal aggregate -> (b,h,w,f)
        feat = nn.relu(nn.Conv(128, (3, 3), padding="SAME", name="conv_agg")(feat))
        # dynamic filters: (b,h,w, s^2 * fs^2), softmaxed over the filter taps
        filters = nn.Conv(s * s * fs * fs, (1, 1), name="conv_filters")(feat)
        filters = jax.nn.softmax(filters.reshape(b, h, w, s * s, fs * fs), axis=-1)
        # residual map
        residual = nn.Conv(3 * s * s, (1, 1), name="conv_residual")(feat)

        # apply per-pixel filters to the center frame
        center = lqs[:, t // 2]
        pad = fs // 2
        cp = jnp.pad(center, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
        patches = jnp.stack([
            cp[:, i:i + h, j:j + w, :] for i in range(fs) for j in range(fs)
        ], axis=-1)  # (b,h,w,3,fs^2)
        out = jnp.einsum("bhwcf,bhwsf->bhwsc", patches, filters)  # (b,h,w,s^2,3)
        out = out.reshape(b, h, w, s * s * 3) + residual
        # depth-to-space with (c, sh, sw) channel ordering
        out = out.reshape(b, h, w, s, s, 3).transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h * s, w * s, 3)
        return out
