"""Remaining video-SR zoo members: TOFlow and DUF — full-fidelity NHWC(+T)
flax rewrites of the diffusion-tree vendored basicsr tof_arch.py (task-
oriented flow alignment + fusion CNN) and duf_arch.py (dynamic upsampling
filters via 3D dense blocks).  BasicSR inheritance, not on the SSL path;
oracle-parity tests in tests/test_reference_parity_zoo.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.basicvsr_arch import flow_warp, interp_bilinear
from ssl_tpu.archs.arch_util import pixel_shuffle
from ssl_tpu.utils.registry import ARCH_REGISTRY

_TOF_MEAN = (0.485, 0.456, 0.406)
_TOF_STD = (0.229, 0.224, 0.225)


class _TOFBasicModule(nn.Module):
    """SPyNetTOF refinement unit (tof_arch.py:9-39): 5 7x7 convs, the first
    four bias-free with BatchNorm+ReLU."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, feats in enumerate((32, 64, 32, 16)):
            x = nn.Conv(feats, (7, 7), padding="SAME", use_bias=False,
                        name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(x)
            x = nn.relu(x)
        return nn.Conv(2, (7, 7), padding="SAME", name="conv_4")(x)


class SPyNetTOF(nn.Module):
    """4-level SPyNet variant with BatchNorm, no normalization
    (tof_arch.py:42-90).  Requires h, w divisible by 16."""

    @nn.compact
    def __call__(self, ref, supp, train: bool = False):
        b, h, w, _ = ref.shape
        refs, supps = [ref], [supp]
        for _ in range(3):
            refs.insert(0, nn.avg_pool(refs[0], (2, 2), strides=(2, 2)))
            supps.insert(0, nn.avg_pool(supps[0], (2, 2), strides=(2, 2)))
        flow = jnp.zeros((b, h // 16, w // 16, 2))
        for i in range(4):
            flow_up = interp_bilinear(flow, (flow.shape[1] * 2, flow.shape[2] * 2),
                                      align_corners=True) * 2.0
            inp = jnp.concatenate(
                [refs[i], flow_warp(supps[i], flow_up), flow_up], axis=-1)
            flow = flow_up + _TOFBasicModule(name=f"basic_module_{i}")(inp, train)
        return flow


@ARCH_REGISTRY.register()
class TOFlow(nn.Module):
    """Task-oriented flow video SR (reference tof_arch.py:94-172): warp the 7
    pre-upscaled neighbor frames to the reference with learned flow, fuse with
    a 4-conv CNN.  lqs (b,7,h,w,3) -> (b,h,w,3)."""
    adapt_official_weights: bool = False

    @nn.compact
    def __call__(self, lqs, train: bool = False):
        b, t, h, w, c = lqs.shape
        ref_idx = 0 if self.adapt_official_weights else 3
        if self.adapt_official_weights:
            lqs = lqs[:, jnp.asarray([3, 0, 1, 2, 4, 5, 6])]
        mean = jnp.asarray(_TOF_MEAN)
        std = jnp.asarray(_TOF_STD)
        lqs = (lqs - mean) / std

        spynet = SPyNetTOF(name="spynet")
        lr_ref = lqs[:, ref_idx]
        aligned = []
        for i in range(7):
            if i == ref_idx:
                aligned.append(lr_ref)
            else:
                flow = spynet(lr_ref, lqs[:, i], train)
                aligned.append(flow_warp(lqs[:, i], flow))
        x = jnp.concatenate(aligned, axis=-1)                   # (b,h,w,21)
        x = nn.relu(nn.Conv(64, (9, 9), padding="SAME", name="conv_1")(x))
        x = nn.relu(nn.Conv(64, (9, 9), padding="SAME", name="conv_2")(x))
        x = nn.relu(nn.Conv(64, (1, 1), name="conv_3")(x))
        hr = nn.Conv(3, (1, 1), name="conv_4")(x) + lr_ref
        return hr * std + mean


# ---------------------------------------------------------------------------
# DUF (reference duf_arch.py) — dynamic upsampling filters
# ---------------------------------------------------------------------------
class _BnReluConv3d(nn.Module):
    """BN-ReLU-Conv1x1x1-BN-ReLU-Conv3 unit shared by the DUF dense blocks.
    x: (b, t, h, w, c) NDHWC."""
    grow_ch: int
    t_pad: int          # 1 = temporal SAME (DenseBlocks), 0 = VALID (reduce)
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.BatchNorm(use_running_average=not train, epsilon=self.eps,
                         name="bn0")(x)
        y = nn.relu(y)
        y = nn.Conv(c, (1, 1, 1), name="conv0")(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=self.eps,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.grow_ch, (3, 3, 3),
                    padding=((self.t_pad, self.t_pad), (1, 1), (1, 1)),
                    name="conv1")(y)
        return y


@ARCH_REGISTRY.register()
class DUF(nn.Module):
    """DUF (reference duf_arch.py:182-276): 3D dense blocks over 7 frames,
    temporal reduction to 1, then per-pixel 5x5 dynamic upsampling filters
    (softmaxed over taps) applied to the center frame + a residual map.
    lqs (b,7,h,w,3) -> (b, s*h, s*w, 3)."""
    scale: int = 4
    num_layer: int = 52
    adapt_official_weights: bool = False

    @nn.compact
    def __call__(self, lqs, train: bool = False):
        b, t, h, w, c = lqs.shape
        s = self.scale
        eps = 1e-3 if self.adapt_official_weights else 1e-5
        if self.num_layer == 16:
            num_block, grow = 3, 32
        elif self.num_layer == 28:
            num_block, grow = 9, 16
        elif self.num_layer == 52:
            num_block, grow = 21, 16
        else:
            raise ValueError(f"num_layer must be 16/28/52, got {self.num_layer}")

        x_center = lqs[:, t // 2]
        x = nn.Conv(64, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                    name="conv3d1")(lqs)
        # DenseBlocks (duf_arch.py:78-131): concat-growth, temporal SAME
        for i in range(num_block):
            y = _BnReluConv3d(grow, t_pad=1, eps=eps, name=f"dense1_{i}")(x, train)
            x = jnp.concatenate([x, y], axis=-1)
        # DenseBlocksTemporalReduce (duf_arch.py:9-75): 3 blocks, t -> t-6
        for i in range(3):
            y = _BnReluConv3d(grow, t_pad=0, eps=eps, name=f"reduce_{i}")(x, train)
            x = jnp.concatenate([x[:, 1:-1], y], axis=-1)

        x = nn.BatchNorm(use_running_average=not train, epsilon=eps,
                         name="bn3d2")(x)
        x = nn.relu(x)
        x = nn.relu(nn.Conv(256, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                            name="conv3d2")(x))

        res = nn.Conv(3 * s * s, (1, 1, 1), name="conv3d_r2")(
            nn.relu(nn.Conv(256, (1, 1, 1), name="conv3d_r1")(x)))
        filt = nn.Conv(25 * s * s, (1, 1, 1), name="conv3d_f2")(
            nn.relu(nn.Conv(512, (1, 1, 1), name="conv3d_f1")(x)))

        # (b,1,h,w, 25*s^2) -> softmax over the 25 taps (channel split is
        # tap-major, matching torch .view(b, 25, s^2, h, w))
        filt = filt.reshape(b, h, w, 25, s * s)
        filt = jax.nn.softmax(filt, axis=-2)

        # dynamic filter on the center frame: im2col patches (tap = kh*5+kw)
        pad = 2
        cp = jnp.pad(x_center, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        patches = jnp.stack(
            [cp[:, i:i + h, j:j + w, :] for i in range(5) for j in range(5)],
            axis=-1)                                            # (b,h,w,3,25)
        out = jnp.einsum("bhwct,bhwtu->bhwcu", patches, filt)   # (b,h,w,3,s^2)
        out = out.reshape(b, h, w, 3 * s * s) + res[:, 0]
        return pixel_shuffle(out, s)
