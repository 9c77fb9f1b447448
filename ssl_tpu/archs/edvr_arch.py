"""EDVR — video restoration with PCD deformable alignment + TSA fusion.

Reference parity: diffusion-tree vendored basicsr archs/edvr_arch.py (the
EDVR lineage is the reference's DCNv2 consumer, SURVEY §2.1 N2).  NHWC flax;
deformable alignment uses ops/deform_conv.modulated_deform_conv2d."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.arch_util import ResidualBlockNoBN, pixel_shuffle
from ssl_tpu.ops.deform_conv import modulated_deform_conv2d
from ssl_tpu.utils.registry import ARCH_REGISTRY


class _DeformAlign(nn.Module):
    """Offset-predicting modulated deformable conv (DCNv2Pack equivalent)."""
    num_feat: int
    deform_groups: int = 8

    @nn.compact
    def __call__(self, feat, cond):
        k = 3
        pred = nn.Conv(self.deform_groups * 3 * k * k, (3, 3), padding="SAME",
                       kernel_init=nn.initializers.zeros, name="conv_offset")(cond)
        o1, o2, m = jnp.split(pred, 3, axis=-1)
        offset = jnp.stack([o1, o2], axis=-1).reshape(pred.shape[:3] + (-1,))
        mask = jax.nn.sigmoid(m)
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (k, k, feat.shape[-1], self.num_feat))
        bias = self.param("bias", nn.initializers.zeros, (self.num_feat,))
        return modulated_deform_conv2d(feat, offset, mask, weight, bias,
                                       deform_groups=self.deform_groups)


class PCDAlignment(nn.Module):
    """Pyramid cascading deformable alignment (reference edvr_arch.py PCD)."""
    num_feat: int = 64
    deform_groups: int = 8

    @nn.compact
    def __call__(self, nbr_pyr, ref_pyr):
        lrelu = lambda v: nn.leaky_relu(v, 0.1)
        upsampled_offset_feat = None
        aligned = None
        for lvl in (2, 1, 0):  # coarsest -> finest
            cond = jnp.concatenate([nbr_pyr[lvl], ref_pyr[lvl]], axis=-1)
            cond = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME",
                                 name=f"offset_conv1_l{lvl}")(cond))
            if upsampled_offset_feat is not None:
                cond = jnp.concatenate([cond, upsampled_offset_feat], axis=-1)
                cond = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME",
                                     name=f"offset_conv2_l{lvl}")(cond))
            feat = _DeformAlign(self.num_feat, self.deform_groups,
                                name=f"dcn_l{lvl}")(nbr_pyr[lvl], cond)
            if aligned is not None:
                feat = jnp.concatenate([feat, aligned], axis=-1)
                feat = nn.Conv(self.num_feat, (3, 3), padding="SAME",
                               name=f"feat_conv_l{lvl}")(feat)
            if lvl > 0:
                feat = lrelu(feat)
                b, h, w, c = cond.shape
                upsampled_offset_feat = jax.image.resize(
                    cond, (b, h * 2, w * 2, c), "bilinear") * 2
                aligned = jax.image.resize(feat, (b, h * 2, w * 2, feat.shape[-1]),
                                           "bilinear")
            else:
                aligned = feat
        # final cascading refinement at full resolution
        cond = jnp.concatenate([aligned, ref_pyr[0]], axis=-1)
        cond = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="cas_offset1")(cond))
        return lrelu(_DeformAlign(self.num_feat, self.deform_groups,
                                  name="cas_dcn")(aligned, cond))


class TSAFusion(nn.Module):
    """Temporal-spatial attention fusion (reference edvr_arch.py TSA)."""
    num_feat: int = 64
    num_frame: int = 5
    center: int = 2

    @nn.compact
    def __call__(self, aligned):  # (b, t, h, w, c)
        b, t, h, w, c = aligned.shape
        lrelu = lambda v: nn.leaky_relu(v, 0.1)
        emb_ref = nn.Conv(self.num_feat, (3, 3), padding="SAME",
                          name="temporal_attn1")(aligned[:, self.center])
        emb_all = nn.Conv(self.num_feat, (3, 3), padding="SAME",
                          name="temporal_attn2")(aligned.reshape(-1, h, w, c))
        emb_all = emb_all.reshape(b, t, h, w, -1)
        probs = jax.nn.sigmoid(jnp.sum(emb_all * emb_ref[:, None], axis=-1,
                                       keepdims=True))  # (b,t,h,w,1)
        feat = (aligned * probs).transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
        feat = lrelu(nn.Conv(self.num_feat, (1, 1), name="feat_fusion")(feat))
        # spatial attention (downsample-upsample gate)
        attn = lrelu(nn.Conv(self.num_feat, (1, 1), name="sa1")(feat))
        attn_ds = nn.max_pool(attn, (3, 3), strides=(2, 2), padding="SAME")
        attn_ds = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="sa2")(attn_ds))
        attn_us = jax.image.resize(attn_ds, attn.shape, "bilinear")
        gate = jax.nn.sigmoid(nn.Conv(self.num_feat, (3, 3), padding="SAME",
                                      name="sa3")(attn_us))
        return feat * gate * 2 + feat


@ARCH_REGISTRY.register()
class EDVR(nn.Module):
    """EDVR (reference edvr_arch.py): feature pyramid -> PCD align each frame
    to the center -> TSA fusion -> reconstruction.  lqs (b,t,h,w,3) -> center
    frame SR (b, 4h, 4w, 3)."""
    num_feat: int = 64
    num_frame: int = 5
    num_extract_block: int = 5
    num_reconstruct_block: int = 10
    deform_groups: int = 8

    @nn.compact
    def __call__(self, lqs):
        b, t, h, w, c = lqs.shape
        center = t // 2
        lrelu = lambda v: nn.leaky_relu(v, 0.1)
        x = lqs.reshape(-1, h, w, c)
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_first")(x))
        for i in range(self.num_extract_block):
            feat = ResidualBlockNoBN(self.num_feat, name=f"extract_{i}")(feat)
        l1 = feat
        l2 = lrelu(nn.Conv(self.num_feat, (3, 3), strides=2, padding="SAME", name="l2_1")(l1))
        l2 = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="l2_2")(l2))
        l3 = lrelu(nn.Conv(self.num_feat, (3, 3), strides=2, padding="SAME", name="l3_1")(l2))
        l3 = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="l3_2")(l3))

        def pyr(x_, lvl_shape):
            return x_.reshape((b, t) + x_.shape[1:])

        p1, p2, p3 = pyr(l1, None), pyr(l2, None), pyr(l3, None)
        ref_pyr = [p1[:, center], p2[:, center], p3[:, center]]
        pcd = PCDAlignment(self.num_feat, self.deform_groups, name="pcd")
        aligned = jnp.stack([pcd([p1[:, i], p2[:, i], p3[:, i]], ref_pyr)
                             for i in range(t)], axis=1)
        feat = TSAFusion(self.num_feat, t, center, name="tsa")(aligned)
        for i in range(self.num_reconstruct_block):
            feat = ResidualBlockNoBN(self.num_feat, name=f"recon_{i}")(feat)
        feat = lrelu(nn.Conv(self.num_feat * 4, (3, 3), padding="SAME", name="upconv1")(feat))
        feat = pixel_shuffle(feat, 2)
        feat = lrelu(nn.Conv(self.num_feat * 4, (3, 3), padding="SAME", name="upconv2")(feat))
        feat = pixel_shuffle(feat, 2)
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv_hr")(feat))
        out = nn.Conv(3, (3, 3), padding="SAME", name="conv_last")(feat)
        base = jax.image.resize(lqs[:, center], (b, h * 4, w * 4, 3), "bilinear")
        return out + base
