"""RRDBNet — ESRGAN / RealESRGAN generator (reference: archs/rrdbnet_arch.py:67).

23 RRDB trunk blocks, pixel-unshuffle input packing for x1/x2 scales, two
nearest-up conv stages in the tail.  NHWC, flax.linen."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.arch_util import Conv3x3, pixel_unshuffle, resize_nearest
from ssl_tpu.utils.registry import ARCH_REGISTRY


class ResidualDenseBlock(nn.Module):
    """5-conv dense block with 0.2 residual scaling (reference rrdbnet_arch.py:12-47)."""
    num_feat: int = 64
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        x1 = lrelu(Conv3x3(self.num_grow_ch, init_scale=0.1)(x))
        x2 = lrelu(Conv3x3(self.num_grow_ch, init_scale=0.1)(jnp.concatenate([x, x1], -1)))
        x3 = lrelu(Conv3x3(self.num_grow_ch, init_scale=0.1)(jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu(Conv3x3(self.num_grow_ch, init_scale=0.1)(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = Conv3x3(self.num_feat, init_scale=0.1)(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (reference rrdbnet_arch.py:50-64)."""
    num_feat: int
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch)(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch)(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch)(out)
        return out * 0.2 + x


class _RRDBScanCell(nn.Module):
    """(carry, _) -> (carry, None) adapter so RRDB rides under nn.scan."""
    num_feat: int
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, carry, _):
        return RRDB(self.num_feat, self.num_grow_ch)(carry), None


def _remat_cell(cell, policy: str):
    """Wrap a scan cell per the remat policy ('full' | 'dots' | 'none')."""
    import jax
    if policy == "full":
        return nn.remat(cell)
    if policy == "dots":
        return nn.remat(cell, policy=jax.checkpoint_policies.checkpoint_dots)
    if policy == "none":
        return cell
    raise ValueError(f"unknown remat_policy {policy!r}")


@ARCH_REGISTRY.register()
class RRDBNet(nn.Module):
    """ESRGAN generator (reference rrdbnet_arch.py:67-140).

    scale: 1/2/4; for 1 and 2 the input is pixel-unshuffled so the trunk always
    works at 1/4 resolution of the x4 output.

    TPU note: with ``scan_blocks`` (default) the 23 identical RRDB blocks run
    under ``nn.scan`` + remat — XLA compiles ONE block body instead of 23
    inlined copies (~20x faster compiles, same math; params are stacked with a
    leading (num_block,) axis — weight porting stacks per-block leaves)."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scan_blocks: bool = True
    # Rematerialization of the scanned trunk in the backward pass:
    #   'full' — recompute each block's forward (min memory, +1 fwd of FLOPs)
    #   'dots' — save conv/matmul outputs, recompute elementwise only
    #   'none' — save everything (max memory, min FLOPs)
    # Trunk activations at the shipped train config (b16, 32² feat) are a few
    # GB — comfortably inside v5e HBM, so training recipes default to 'dots'
    # via train.remat_policy; 'full' stays the arch default for inference-at-
    # large-tile safety.
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        if self.scale == 2:
            feat = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            feat = pixel_unshuffle(x, 4)
        else:
            feat = x
        feat = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_first")(feat)
        if self.scan_blocks:
            cell = _remat_cell(_RRDBScanCell, self.remat_policy)
            ScanRRDB = nn.scan(
                cell, variable_axes={"params": 0},
                split_rngs={"params": True}, length=self.num_block,
                metadata_params={nn.meta.PARTITION_NAME: None})
            body, _ = ScanRRDB(self.num_feat, self.num_grow_ch, name="body")(feat, None)
        else:
            body = feat
            for i in range(self.num_block):
                body = RRDB(self.num_feat, self.num_grow_ch, name=f"body_{i}")(body)
        body = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_body")(body)
        feat = feat + body
        # upsample x4 (two nearest x2 + conv stages)
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_up1")(resize_nearest(feat, 2)))
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_up2")(resize_nearest(feat, 2)))
        out = nn.Conv(self.num_out_ch, (3, 3), padding="SAME", name="conv_last")(
            lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_hr")(feat)))
        return out


@ARCH_REGISTRY.register()
class RRDBPSNet(nn.Module):
    """RRDBNet with a pixel-shuffle upsampler tail instead of nearest+conv
    (reference rrdbnet_arch.py:143-195)."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        from ssl_tpu.archs.arch_util import Upsample
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        if self.scale == 2:
            feat = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            feat = pixel_unshuffle(x, 4)
        else:
            feat = x
        feat = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_first")(feat)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, name=f"body_{i}")(body)
        body = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_body")(body)
        feat = feat + body
        feat = lrelu(Upsample(self.scale, self.num_feat, name="upsample")(feat))
        out = nn.Conv(self.num_out_ch, (3, 3), padding="SAME", name="conv_last")(
            lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_hr")(feat)))
        return out


@ARCH_REGISTRY.register()
class RRDBMeanNet(nn.Module):
    """RRDBNet variant with DIV2K mean-shift in/out wrappers
    (reference rrdbnet_arch.py:197-258): (x-mean)*range -> RRDBNet body/tail
    -> /range + mean.  Identical state-dict layout to RRDBNet, so
    convert_rrdbnet covers it."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scan_blocks: bool = True
    img_range: float = 255.0
    rgb_mean: tuple = (0.4488, 0.4371, 0.4040)

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        mean = jnp.asarray(self.rgb_mean)
        x = (x - mean) * self.img_range
        if self.scale == 2:
            feat = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            feat = pixel_unshuffle(x, 4)
        else:
            feat = x
        feat = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_first")(feat)
        if self.scan_blocks:
            ScanRRDB = nn.scan(
                nn.remat(_RRDBScanCell), variable_axes={"params": 0},
                split_rngs={"params": True}, length=self.num_block,
                metadata_params={nn.meta.PARTITION_NAME: None})
            body, _ = ScanRRDB(self.num_feat, self.num_grow_ch, name="body")(feat, None)
        else:
            body = feat
            for i in range(self.num_block):
                body = RRDB(self.num_feat, self.num_grow_ch, name=f"body_{i}")(body)
        body = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_body")(body)
        feat = feat + body
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_up1")(resize_nearest(feat, 2)))
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_up2")(resize_nearest(feat, 2)))
        out = nn.Conv(self.num_out_ch, (3, 3), padding="SAME", name="conv_last")(
            lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_hr")(feat)))
        return out / self.img_range + mean
