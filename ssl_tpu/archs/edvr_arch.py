"""EDVR — video restoration with enhanced deformable convolutions.

Full-fidelity NHWC flax rewrite of the diffusion-tree vendored
basicsr/archs/edvr_arch.py (PCD alignment pyramid, TSA fusion, optional
pre-deblur) on top of the TPU-native DCNv2 (ops/deform_conv.py, SURVEY §2.1
N2).  Weight converter: utils/weight_port.convert_edvr (including the
mmcv conv_offset channel-interleave permutation); oracle-parity test in
tests/test_reference_parity_zoo.py runs the reference torch module with a
CPU DCN implementing the exact mmcv kernel semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.arch_util import ResidualBlockNoBN, pixel_shuffle
from ssl_tpu.archs.basicvsr_arch import interp_bilinear
from ssl_tpu.ops.deform_conv import modulated_deform_conv2d
from ssl_tpu.utils.registry import ARCH_REGISTRY


def _lrelu(x):
    return nn.leaky_relu(x, 0.1)


def _up2(x):
    b, h, w, c = x.shape
    return interp_bilinear(x, (h * 2, w * 2), align_corners=False)


def _pool3s2(x, kind):
    """torch MaxPool2d/AvgPool2d(3, stride=2, padding=1); AvgPool counts the
    zero padding (count_include_pad=True default)."""
    if kind == "max":
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    return nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       count_include_pad=True)


class DCNv2PackM(nn.Module):
    """Flax DCNv2Pack (reference arch_util.py DCNv2Pack): conv predicts
    (offsets, mask) from `feat`, deformable conv samples `x`.

    Channel layout of the predicting conv: [all y (dg,kh,kw) | all x | mask]
    — SANER than mmcv's per-group interleave; the weight converter permutes
    reference conv_offset channels into this layout."""
    num_feat: int
    deform_groups: int = 8

    @nn.compact
    def __call__(self, x, feat):
        k = 3
        dg = self.deform_groups
        pred = nn.Conv(dg * 3 * k * k, (3, 3), padding="SAME",
                       kernel_init=nn.initializers.zeros, name="conv_offset")(feat)
        o1, o2, m = jnp.split(pred, 3, axis=-1)
        offset = jnp.stack([o1, o2], axis=-1).reshape(pred.shape[:3] + (-1,))
        mask = jax.nn.sigmoid(m)
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (k, k, x.shape[-1], self.num_feat))
        bias = self.param("bias", nn.initializers.zeros, (self.num_feat,))
        return modulated_deform_conv2d(x, offset, mask, weight, bias,
                                       deform_groups=dg)


class PCDAlignment(nn.Module):
    """Pyramid-cascading-deformable alignment (edvr_arch.py:9-97)."""
    num_feat: int = 64
    deform_groups: int = 8

    @nn.compact
    def __call__(self, nbr_feat_l, ref_feat_l):
        nf = self.num_feat
        upsampled_offset, upsampled_feat = None, None
        feat = None
        for i in range(3, 0, -1):
            lv = f"l{i}"
            offset = jnp.concatenate([nbr_feat_l[i - 1], ref_feat_l[i - 1]], axis=-1)
            offset = _lrelu(nn.Conv(nf, (3, 3), padding="SAME",
                                    name=f"offset_conv1_{lv}")(offset))
            if i == 3:
                offset = _lrelu(nn.Conv(nf, (3, 3), padding="SAME",
                                        name=f"offset_conv2_{lv}")(offset))
            else:
                offset = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name=f"offset_conv2_{lv}")(
                    jnp.concatenate([offset, upsampled_offset], axis=-1)))
                offset = _lrelu(nn.Conv(nf, (3, 3), padding="SAME",
                                        name=f"offset_conv3_{lv}")(offset))

            feat = DCNv2PackM(nf, self.deform_groups,
                              name=f"dcn_pack_{lv}")(nbr_feat_l[i - 1], offset)
            if i < 3:
                feat = nn.Conv(nf, (3, 3), padding="SAME", name=f"feat_conv_{lv}")(
                    jnp.concatenate([feat, upsampled_feat], axis=-1))
            if i > 1:
                feat = _lrelu(feat)
                upsampled_offset = _up2(offset) * 2.0
                upsampled_feat = _up2(feat)

        offset = jnp.concatenate([feat, ref_feat_l[0]], axis=-1)
        offset = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="cas_offset_conv2")(
            _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="cas_offset_conv1")(offset))))
        feat = _lrelu(DCNv2PackM(nf, self.deform_groups, name="cas_dcnpack")(feat, offset))
        return feat


class TSAFusion(nn.Module):
    """Temporal-spatial attention fusion (edvr_arch.py:100-189).
    aligned_feat: (b, t, h, w, c) -> (b, h, w, c)."""
    num_feat: int = 64
    num_frame: int = 5
    center_frame_idx: int = 2

    @nn.compact
    def __call__(self, aligned_feat):
        b, t, h, w, c = aligned_feat.shape
        nf = self.num_feat
        emb_ref = nn.Conv(nf, (3, 3), padding="SAME", name="temporal_attn1")(
            aligned_feat[:, self.center_frame_idx])
        emb = nn.Conv(nf, (3, 3), padding="SAME", name="temporal_attn2")(
            aligned_feat.reshape(b * t, h, w, c)).reshape(b, t, h, w, -1)
        corr = jnp.sum(emb * emb_ref[:, None], axis=-1)          # (b,t,h,w)
        corr_prob = jax.nn.sigmoid(corr)[..., None]              # (b,t,h,w,1)
        feat = (aligned_feat * corr_prob).transpose(0, 2, 3, 1, 4) \
            .reshape(b, h, w, t * c)                             # t-major channels

        fused = _lrelu(nn.Conv(nf, (1, 1), name="feat_fusion")(feat))

        attn = _lrelu(nn.Conv(nf, (1, 1), name="spatial_attn1")(feat))
        attn_max = _pool3s2(attn, "max")
        attn_avg = _pool3s2(attn, "avg")
        attn = _lrelu(nn.Conv(nf, (1, 1), name="spatial_attn2")(
            jnp.concatenate([attn_max, attn_avg], axis=-1)))
        attn_level = _lrelu(nn.Conv(nf, (1, 1), name="spatial_attn_l1")(attn))
        attn_max = _pool3s2(attn_level, "max")
        attn_avg = _pool3s2(attn_level, "avg")
        attn_level = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="spatial_attn_l2")(
            jnp.concatenate([attn_max, attn_avg], axis=-1)))
        attn_level = _lrelu(nn.Conv(nf, (3, 3), padding="SAME",
                                    name="spatial_attn_l3")(attn_level))
        attn_level = _up2(attn_level)

        attn = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="spatial_attn3")(attn))
        attn = attn + attn_level
        attn = _lrelu(nn.Conv(nf, (1, 1), name="spatial_attn4")(attn))
        attn = _up2(attn)
        attn = nn.Conv(nf, (3, 3), padding="SAME", name="spatial_attn5")(attn)
        attn_add = nn.Conv(nf, (1, 1), name="spatial_attn_add2")(
            _lrelu(nn.Conv(nf, (1, 1), name="spatial_attn_add1")(attn)))
        attn = jax.nn.sigmoid(attn)
        return fused * attn * 2.0 + attn_add


class PredeblurModule(nn.Module):
    """Pre-deblur pyramid (edvr_arch.py:192-242)."""
    num_feat: int = 64
    hr_in: bool = False

    @nn.compact
    def __call__(self, x):
        nf = self.num_feat
        feat_l1 = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="conv_first")(x))
        if self.hr_in:
            feat_l1 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                     name="stride_conv_hr1")(feat_l1))
            feat_l1 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                     name="stride_conv_hr2")(feat_l1))
        feat_l2 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                 name="stride_conv_l2")(feat_l1))
        feat_l3 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                 name="stride_conv_l3")(feat_l2))
        feat_l3 = _up2(ResidualBlockNoBN(nf, name="resblock_l3")(feat_l3))
        feat_l2 = ResidualBlockNoBN(nf, name="resblock_l2_1")(feat_l2) + feat_l3
        feat_l2 = _up2(ResidualBlockNoBN(nf, name="resblock_l2_2")(feat_l2))
        for i in range(2):
            feat_l1 = ResidualBlockNoBN(nf, name=f"resblock_l1_{i}")(feat_l1)
        feat_l1 = feat_l1 + feat_l2
        for i in range(2, 5):
            feat_l1 = ResidualBlockNoBN(nf, name=f"resblock_l1_{i}")(feat_l1)
        return feat_l1


class _PyramidFeatures(nn.Module):
    """Shared L1/L2/L3 pyramid extraction (edvr_arch.py:300-304)."""
    num_feat: int
    num_extract_block: int

    @nn.compact
    def __call__(self, feat_l1):
        nf = self.num_feat
        for i in range(self.num_extract_block):
            feat_l1 = ResidualBlockNoBN(nf, name=f"extract_{i}")(feat_l1)
        feat_l2 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                 name="conv_l2_1")(feat_l1))
        feat_l2 = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="conv_l2_2")(feat_l2))
        feat_l3 = _lrelu(nn.Conv(nf, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                                 name="conv_l3_1")(feat_l2))
        feat_l3 = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="conv_l3_2")(feat_l3))
        return feat_l1, feat_l2, feat_l3


@ARCH_REGISTRY.register()
class EDVR(nn.Module):
    """EDVR (reference edvr_arch.py:245-382), x4.
    x: (b, t, h, w, 3) -> (b, 4h, 4w, 3) (center frame)."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_frame: int = 5
    deform_groups: int = 8
    num_extract_block: int = 5
    num_reconstruct_block: int = 10
    center_frame_idx: int | None = None
    hr_in: bool = False
    with_predeblur: bool = False
    with_tsa: bool = True

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        nf = self.num_feat
        center = self.center_frame_idx if self.center_frame_idx is not None \
            else self.num_frame // 2
        x_center = x[:, center]

        frames = x.reshape(b * t, h, w, c)
        if self.with_predeblur:
            feat_l1 = nn.Conv(nf, (1, 1), name="conv_1x1")(
                PredeblurModule(nf, self.hr_in, name="predeblur")(frames))
            if self.hr_in:
                h, w = h // 4, w // 4
        else:
            feat_l1 = _lrelu(nn.Conv(nf, (3, 3), padding="SAME",
                                     name="conv_first")(frames))
        feat_l1, feat_l2, feat_l3 = _PyramidFeatures(
            nf, self.num_extract_block, name="pyramid")(feat_l1)
        feat_l1 = feat_l1.reshape(b, t, h, w, -1)
        feat_l2 = feat_l2.reshape(b, t, h // 2, w // 2, -1)
        feat_l3 = feat_l3.reshape(b, t, h // 4, w // 4, -1)

        pcd = PCDAlignment(nf, self.deform_groups, name="pcd_align")
        ref_feat_l = [feat_l1[:, center], feat_l2[:, center], feat_l3[:, center]]
        aligned = [pcd([feat_l1[:, i], feat_l2[:, i], feat_l3[:, i]], ref_feat_l)
                   for i in range(t)]
        aligned_feat = jnp.stack(aligned, axis=1)                # (b,t,h,w,c)

        if self.with_tsa:
            feat = TSAFusion(nf, self.num_frame, center, name="fusion")(aligned_feat)
        else:
            flat = aligned_feat.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * nf)
            feat = nn.Conv(nf, (1, 1), name="fusion")(flat)

        out = feat
        for i in range(self.num_reconstruct_block):
            out = ResidualBlockNoBN(nf, name=f"recon_{i}")(out)
        out = _lrelu(pixel_shuffle(nn.Conv(nf * 4, (3, 3), padding="SAME",
                                           name="upconv1")(out), 2))
        out = _lrelu(pixel_shuffle(nn.Conv(64 * 4, (3, 3), padding="SAME",
                                           name="upconv2")(out), 2))
        out = _lrelu(nn.Conv(64, (3, 3), padding="SAME", name="conv_hr")(out))
        out = nn.Conv(3, (3, 3), padding="SAME", name="conv_last")(out)
        if self.hr_in:
            base = x_center
        else:
            base = interp_bilinear(x_center, (4 * h, 4 * w), align_corners=False)
        return out + base


class EDVRFeatureExtractor(nn.Module):
    """EDVR front-end used by IconVSR (basicvsr_arch.py:271-336):
    pyramid features + PCD + TSA, no reconstruction.
    x: (b, t, h, w, 3) -> (b, h, w, num_feat)."""
    num_input_frame: int
    num_feat: int = 64

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        nf = self.num_feat
        center = self.num_input_frame // 2
        feat_l1 = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="conv_first")(
            x.reshape(b * t, h, w, c)))
        feat_l1, feat_l2, feat_l3 = _PyramidFeatures(nf, 5, name="pyramid")(feat_l1)
        feat_l1 = feat_l1.reshape(b, t, h, w, -1)
        feat_l2 = feat_l2.reshape(b, t, h // 2, w // 2, -1)
        feat_l3 = feat_l3.reshape(b, t, h // 4, w // 4, -1)
        pcd = PCDAlignment(nf, 8, name="pcd_align")
        ref_feat_l = [feat_l1[:, center], feat_l2[:, center], feat_l3[:, center]]
        aligned = [pcd([feat_l1[:, i], feat_l2[:, i], feat_l3[:, i]], ref_feat_l)
                   for i in range(t)]
        aligned_feat = jnp.stack(aligned, axis=1)
        return TSAFusion(nf, self.num_input_frame, center, name="fusion")(aligned_feat)
