"""Video SR: SPyNet optical flow + BasicVSR bidirectional recurrent SR.

Full-fidelity NHWC flax rewrites of the diffusion-tree vendored basicsr archs
(spynet_arch.py, basicvsr_arch.py, basicvsrpp_arch.py) — BasicSR inheritance,
not on the SSL path.  Weight converters live in utils/weight_port.py and the
oracle-parity tests in tests/test_reference_parity_zoo.py execute the
reference torch modules as oracles.

torch interpolation semantics are reproduced exactly: `interp_bilinear`
implements F.interpolate(mode='bilinear') for BOTH align_corners conventions
as separable band-matrix products, and `flow_warp` is grid_sample
(align_corners=True) with zeros/border padding."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.arch_util import ResidualBlockNoBN, pixel_shuffle
from ssl_tpu.utils.registry import ARCH_REGISTRY

# ImageNet statistics baked into SpyNet (spynet_arch.py:42-43, fixed buffers)
_SPYNET_MEAN = (0.485, 0.456, 0.406)
_SPYNET_STD = (0.229, 0.224, 0.225)


def _lin_matrix(n_out: int, n_in: int, align_corners: bool) -> jnp.ndarray:
    """(n_out, n_in) row-stochastic linear-interpolation matrix replicating
    torch F.interpolate bilinear source-index rules."""
    if n_out == n_in:
        return jnp.eye(n_in)
    if align_corners:
        src = (jnp.linspace(0.0, n_in - 1.0, n_out) if n_out > 1
               else jnp.zeros((1,)))
    else:
        # half-pixel centers, clamped at 0 like torch area_pixel_compute
        src = (jnp.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        src = jnp.clip(src, 0.0, None)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
    i1 = jnp.minimum(i0 + 1, n_in - 1)
    frac = src - i0
    rows = jnp.arange(n_out)
    mat = jnp.zeros((n_out, n_in))
    mat = mat.at[rows, i0].add(1.0 - frac)
    mat = mat.at[rows, i1].add(frac)
    return mat


def interp_bilinear(x: jnp.ndarray, size: tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """F.interpolate(x, size, mode='bilinear', align_corners=...) for NHWC."""
    b, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    ay = _lin_matrix(oh, h, align_corners)
    ax = _lin_matrix(ow, w, align_corners)
    return jnp.einsum("yh,bhwc,xw->byxc", ay, x, ax)


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray,
              padding_mode: str = "zeros") -> jnp.ndarray:
    """Warp x (b,h,w,c) by flow (b,h,w,2), flow[...,0]=dx, flow[...,1]=dy.

    Matches reference arch_util.flow_warp (grid_sample bilinear,
    align_corners=True): sampling position = pixel + flow in PIXEL space.
    padding_mode 'zeros' masks out-of-range corners; 'border' clamps the
    sampling coordinate first (spynet_arch.py:75 uses border)."""
    b, h, w, c = x.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = yy[None] + flow[..., 1]
    xs = xx[None] + flow[..., 0]
    if padding_mode == "border":
        ys = jnp.clip(ys, 0.0, h - 1.0)
        xs = jnp.clip(xs, 0.0, w - 1.0)

    def sample_one(img, ys_i, xs_i):
        y0 = jnp.floor(ys_i)
        x0 = jnp.floor(xs_i)
        wy = ys_i - y0
        wx = xs_i - x0
        out = 0.0
        for dy, wgt_y in ((0, 1 - wy), (1, wy)):
            for dx, wgt_x in ((0, 1 - wx), (1, wx)):
                yi = jnp.clip((y0 + dy).astype(jnp.int32), 0, h - 1)
                xi = jnp.clip((x0 + dx).astype(jnp.int32), 0, w - 1)
                wgt = wgt_y * wgt_x
                if padding_mode == "zeros":
                    valid = ((y0 + dy >= 0) & (y0 + dy < h) &
                             (x0 + dx >= 0) & (x0 + dx < w)).astype(img.dtype)
                    wgt = wgt * valid
                out = out + img[yi, xi] * wgt[..., None]
        return out

    return jax.vmap(sample_one)(x, ys, xs)


class _SPyNetBasicModule(nn.Module):
    """5-conv flow refinement unit (spynet_arch.py:10-25): 8->32->64->32->16->2,
    all 7x7, relu between."""

    @nn.compact
    def __call__(self, x):
        for i, feats in enumerate((32, 64, 32, 16, 2)):
            x = nn.Conv(feats, (7, 7), padding="SAME", name=f"conv_{i}")(x)
            if feats != 2:
                x = nn.relu(x)
        return x


@ARCH_REGISTRY.register()
@ARCH_REGISTRY.register(name="SpyNet")  # reference spelling (spynet_arch.py:28)
class SPyNet(nn.Module):
    """Coarse-to-fine pyramid optical flow (reference spynet_arch.py:29-96).

    Fixed 6 basic modules; inputs are resized to a multiple of 32, pushed
    through a 6-level avg-pool pyramid, and the final flow is rescaled back.
    Input spatial size after the 32-multiple round-up must be >= 64 (same
    constraint as the reference: a 32px pyramid bottoms out at 1x1 and the
    initial flow tensor becomes empty)."""

    @nn.compact
    def __call__(self, ref, supp):
        b, h, w, _ = ref.shape
        w_fl = int(math.floor(math.ceil(w / 32.0) * 32.0))
        h_fl = int(math.floor(math.ceil(h / 32.0) * 32.0))
        ref = interp_bilinear(ref, (h_fl, w_fl), align_corners=False)
        supp = interp_bilinear(supp, (h_fl, w_fl), align_corners=False)

        mean = jnp.asarray(_SPYNET_MEAN)
        std = jnp.asarray(_SPYNET_STD)
        refs = [(ref - mean) / std]
        supps = [(supp - mean) / std]
        for _ in range(5):
            refs.insert(0, nn.avg_pool(refs[0], (2, 2), strides=(2, 2)))
            supps.insert(0, nn.avg_pool(supps[0], (2, 2), strides=(2, 2)))

        h0, w0 = refs[0].shape[1], refs[0].shape[2]
        flow = jnp.zeros((b, h0 // 2, w0 // 2, 2))
        for level in range(6):
            rh, rw = refs[level].shape[1], refs[level].shape[2]
            up = interp_bilinear(flow, (flow.shape[1] * 2, flow.shape[2] * 2),
                                 align_corners=True) * 2.0
            # replicate-pad one row/col when the doubled size falls short
            if up.shape[1] != rh:
                up = jnp.concatenate([up, up[:, -1:]], axis=1)
            if up.shape[2] != rw:
                up = jnp.concatenate([up, up[:, :, -1:]], axis=2)
            inp = jnp.concatenate(
                [refs[level], flow_warp(supps[level], up, padding_mode="border"), up],
                axis=-1)
            flow = _SPyNetBasicModule(name=f"basic_module_{level}")(inp) + up

        flow = interp_bilinear(flow, (h, w), align_corners=False)
        flow = flow * jnp.asarray([w / float(w_fl), h / float(h_fl)])
        return flow


class ConvResidualBlocks(nn.Module):
    """Conv + lrelu + residual-block trunk (basicvsr_arch.py:101-117)."""
    num_out_ch: int = 64
    num_block: int = 15

    @nn.compact
    def __call__(self, x):
        x = nn.leaky_relu(nn.Conv(self.num_out_ch, (3, 3), padding="SAME",
                                  name="conv")(x), 0.1)
        for i in range(self.num_block):
            x = ResidualBlockNoBN(self.num_out_ch, name=f"block_{i}")(x)
        return x


@ARCH_REGISTRY.register()
class BasicVSR(nn.Module):
    """Bidirectional recurrent video SR, x4 (reference basicvsr_arch.py:12-98).

    lqs: (b, t, h, w, 3) -> (b, t, 4h, 4w, 3)."""
    num_feat: int = 64
    num_block: int = 15

    @nn.compact
    def __call__(self, lqs):
        b, t, h, w, c = lqs.shape
        spynet = SPyNet(name="spynet")
        backward_trunk = ConvResidualBlocks(self.num_feat, self.num_block,
                                            name="backward_trunk")
        forward_trunk = ConvResidualBlocks(self.num_feat, self.num_block,
                                           name="forward_trunk")

        # flows between neighbors (get_flow: x_1 = frames[:-1], x_2 = frames[1:];
        # backward = spynet(x_1, x_2), forward = spynet(x_2, x_1))
        x1 = lqs[:, :-1].reshape(-1, h, w, c)
        x2 = lqs[:, 1:].reshape(-1, h, w, c)
        flow_bwd = spynet(x1, x2).reshape(b, t - 1, h, w, 2)
        flow_fwd = spynet(x2, x1).reshape(b, t - 1, h, w, 2)

        # backward branch
        feats_bwd = []
        feat = jnp.zeros((b, h, w, self.num_feat))
        for i in range(t - 1, -1, -1):
            if i < t - 1:
                feat = flow_warp(feat, flow_bwd[:, i])
            feat = backward_trunk(jnp.concatenate([lqs[:, i], feat], axis=-1))
            feats_bwd.insert(0, feat)

        fusion = nn.Conv(self.num_feat, (1, 1), name="fusion")
        upconv1 = nn.Conv(self.num_feat * 4, (3, 3), padding="SAME", name="upconv1")
        upconv2 = nn.Conv(64 * 4, (3, 3), padding="SAME", name="upconv2")
        conv_hr = nn.Conv(64, (3, 3), padding="SAME", name="conv_hr")
        conv_last = nn.Conv(3, (3, 3), padding="SAME", name="conv_last")

        outs = []
        feat = jnp.zeros((b, h, w, self.num_feat))
        for i in range(t):
            if i > 0:
                feat = flow_warp(feat, flow_fwd[:, i - 1])
            feat = forward_trunk(jnp.concatenate([lqs[:, i], feat], axis=-1))
            y = jnp.concatenate([feats_bwd[i], feat], axis=-1)
            y = nn.leaky_relu(fusion(y), 0.1)
            y = nn.leaky_relu(pixel_shuffle(upconv1(y), 2), 0.1)
            y = nn.leaky_relu(pixel_shuffle(upconv2(y), 2), 0.1)
            y = nn.leaky_relu(conv_hr(y), 0.1)
            y = conv_last(y)
            base = interp_bilinear(lqs[:, i], (4 * h, 4 * w), align_corners=False)
            outs.append(y + base)
        return jnp.stack(outs, axis=1)


@ARCH_REGISTRY.register()
class IconVSR(nn.Module):
    """IconVSR (reference basicvsr_arch.py:121-268): BasicVSR + EDVR-based
    keyframe refill with information-coupled propagation.
    lqs: (b, t, h, w, 3) -> (b, t, 4h, 4w, 3)."""
    num_feat: int = 64
    num_block: int = 15
    keyframe_stride: int = 5
    temporal_padding: int = 2

    @nn.compact
    def __call__(self, lqs):
        from ssl_tpu.archs.edvr_arch import EDVRFeatureExtractor
        b, t, h_in, w_in, c = lqs.shape
        nf = self.num_feat
        # reflect-pad spatially to a multiple of 4 (PCD requirement)
        pad_h = (4 - h_in % 4) % 4
        pad_w = (4 - w_in % 4) % 4
        x = jnp.pad(lqs, ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    mode="reflect")
        h, w = x.shape[2], x.shape[3]

        keyframe_idx = list(range(0, t, self.keyframe_stride))
        if keyframe_idx[-1] != t - 1:
            keyframe_idx.append(t - 1)

        spynet = SPyNet(name="spynet")
        x1 = x[:, :-1].reshape(-1, h, w, c)
        x2 = x[:, 1:].reshape(-1, h, w, c)
        flow_bwd = spynet(x1, x2).reshape(b, t - 1, h, w, 2)
        flow_fwd = spynet(x2, x1).reshape(b, t - 1, h, w, 2)

        # keyframe features via the EDVR front-end on temporally padded input
        tp = self.temporal_padding
        num_frames = 2 * tp + 1
        if tp == 2:
            xpad = jnp.concatenate([x[:, jnp.asarray([4, 3])], x,
                                    x[:, jnp.asarray([t - 4, t - 5])]], axis=1)
        elif tp == 3:
            xpad = jnp.concatenate([x[:, jnp.asarray([6, 5, 4])], x,
                                    x[:, jnp.asarray([t - 5, t - 6, t - 7])]], axis=1)
        else:
            raise ValueError("temporal_padding must be 2 or 3")
        edvr = EDVRFeatureExtractor(num_frames, nf, name="edvr")
        feats_keyframe = {i: edvr(xpad[:, i:i + num_frames]) for i in keyframe_idx}

        backward_fusion = nn.Conv(nf, (3, 3), padding="SAME", name="backward_fusion")
        forward_fusion = nn.Conv(nf, (3, 3), padding="SAME", name="forward_fusion")
        backward_trunk = ConvResidualBlocks(nf, self.num_block, name="backward_trunk")
        forward_trunk = ConvResidualBlocks(nf, self.num_block, name="forward_trunk")

        out_l = []
        feat = jnp.zeros((b, h, w, nf))
        for i in range(t - 1, -1, -1):
            if i < t - 1:
                feat = flow_warp(feat, flow_bwd[:, i])
            if i in keyframe_idx:
                feat = backward_fusion(jnp.concatenate([feat, feats_keyframe[i]], axis=-1))
            feat = backward_trunk(jnp.concatenate([x[:, i], feat], axis=-1))
            out_l.insert(0, feat)

        upconv1 = nn.Conv(nf * 4, (3, 3), padding="SAME", name="upconv1")
        upconv2 = nn.Conv(64 * 4, (3, 3), padding="SAME", name="upconv2")
        conv_hr = nn.Conv(64, (3, 3), padding="SAME", name="conv_hr")
        conv_last = nn.Conv(3, (3, 3), padding="SAME", name="conv_last")

        outs = []
        feat = jnp.zeros((b, h, w, nf))
        for i in range(t):
            if i > 0:
                feat = flow_warp(feat, flow_fwd[:, i - 1])
            if i in keyframe_idx:
                feat = forward_fusion(jnp.concatenate([feat, feats_keyframe[i]], axis=-1))
            feat = forward_trunk(jnp.concatenate([x[:, i], out_l[i], feat], axis=-1))
            y = nn.leaky_relu(pixel_shuffle(upconv1(feat), 2), 0.1)
            y = nn.leaky_relu(pixel_shuffle(upconv2(y), 2), 0.1)
            y = nn.leaky_relu(conv_hr(y), 0.1)
            y = conv_last(y)
            base = interp_bilinear(x[:, i], (4 * h, 4 * w), align_corners=False)
            outs.append(y + base)
        return jnp.stack(outs, axis=1)[:, :, :4 * h_in, :4 * w_in]


class SecondOrderDeformableAlignment(nn.Module):
    """BasicVSR++ second-order flow-guided deformable alignment
    (basicvsrpp_arch.py:347-408).

    The conv_offset stack consumes cat([cond, flow1, flow2]) and emits 27*dg
    channels read as interleaved (y,x) per (group, position) for the offsets
    (torchvision deform_conv2d layout) — groups [0, dg/2) ride flow_1 (they
    sample the feat_prop half of the input channels), groups [dg/2, dg) ride
    flow_2 (the feat_n2 half)."""
    out_channels: int
    deform_groups: int = 16
    max_residue_magnitude: float = 10.0

    @nn.compact
    def __call__(self, x, extra_feat, flow_1, flow_2):
        from ssl_tpu.ops.deform_conv import modulated_deform_conv2d
        dg = self.deform_groups
        oc = self.out_channels
        y = jnp.concatenate([extra_feat, flow_1, flow_2], axis=-1)
        y = nn.leaky_relu(nn.Conv(oc, (3, 3), padding="SAME", name="offset_conv0")(y), 0.1)
        y = nn.leaky_relu(nn.Conv(oc, (3, 3), padding="SAME", name="offset_conv1")(y), 0.1)
        y = nn.leaky_relu(nn.Conv(oc, (3, 3), padding="SAME", name="offset_conv2")(y), 0.1)
        raw = nn.Conv(27 * dg, (3, 3), padding="SAME",
                      kernel_init=nn.initializers.zeros, name="offset_conv3")(y)
        b, h, w, _ = raw.shape
        off = self.max_residue_magnitude * jnp.tanh(raw[..., :18 * dg])
        off = off.reshape(b, h, w, dg, 9, 2)                  # (g, p, y/x)
        flow1_yx = jnp.stack([flow_1[..., 1], flow_1[..., 0]], axis=-1)
        flow2_yx = jnp.stack([flow_2[..., 1], flow_2[..., 0]], axis=-1)
        off = jnp.concatenate([
            off[:, :, :, :dg // 2] + flow1_yx[:, :, :, None, None, :],
            off[:, :, :, dg // 2:] + flow2_yx[:, :, :, None, None, :],
        ], axis=3)
        offset = off.reshape(b, h, w, dg * 18)
        mask = jax.nn.sigmoid(raw[..., 18 * dg:])
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], oc))
        bias = self.param("bias", nn.initializers.zeros, (oc,))
        return modulated_deform_conv2d(x, offset, mask, weight, bias,
                                       deform_groups=dg)


@ARCH_REGISTRY.register()
class BasicVSRPlusPlus(nn.Module):
    """BasicVSR++ (reference basicvsrpp_arch.py:15-344): second-order grid
    propagation over 4 branches with flow-guided deformable alignment.
    lqs (b,t,h,w,3) -> (b,t,4h,4w,3) (x4) or same-size if not
    is_low_res_input."""
    mid_channels: int = 64
    num_blocks: int = 7
    max_residue_magnitude: float = 10.0
    is_low_res_input: bool = True
    deform_groups: int = 16

    @nn.compact
    def __call__(self, lqs):
        b, t, h, w, c = lqs.shape
        mid = self.mid_channels
        if self.is_low_res_input:
            lqs_down = lqs
        else:
            lqs_down = _bicubic_resize_quarter(lqs.reshape(-1, h, w, c)) \
                .reshape(b, t, h // 4, w // 4, c)

        # spatial features
        if self.is_low_res_input:
            feats_ = ConvResidualBlocks(mid, 5, name="feat_extract")(
                lqs.reshape(-1, h, w, c))
        else:
            y = nn.leaky_relu(nn.Conv(mid, (3, 3), strides=(2, 2),
                                      padding=((1, 1), (1, 1)),
                                      name="feat_down1")(lqs.reshape(-1, h, w, c)), 0.1)
            y = nn.leaky_relu(nn.Conv(mid, (3, 3), strides=(2, 2),
                                      padding=((1, 1), (1, 1)),
                                      name="feat_down2")(y), 0.1)
            feats_ = ConvResidualBlocks(mid, 5, name="feat_extract")(y)
        fh, fw = feats_.shape[1], feats_.shape[2]
        feats_ = feats_.reshape(b, t, fh, fw, -1)
        feats = {"spatial": [feats_[:, i] for i in range(t)]}

        # optical flow on the low-res inputs (>= 64px per reference assert)
        spynet = SPyNet(name="spynet")
        dh, dw = lqs_down.shape[2], lqs_down.shape[3]
        x1 = lqs_down[:, :-1].reshape(-1, dh, dw, c)
        x2 = lqs_down[:, 1:].reshape(-1, dh, dw, c)
        flows_backward = spynet(x1, x2).reshape(b, t - 1, dh, dw, 2)
        flows_forward = spynet(x2, x1).reshape(b, t - 1, dh, dw, 2)

        # propagation (order: backward_1, forward_1, backward_2, forward_2)
        for it in (1, 2):
            for direction in ("backward", "forward"):
                module = f"{direction}_{it}"
                feats[module] = []
                flows = flows_backward if direction == "backward" else flows_forward
                align = SecondOrderDeformableAlignment(
                    mid, self.deform_groups, self.max_residue_magnitude,
                    name=f"deform_align_{module}")
                backbone = ConvResidualBlocks(mid, self.num_blocks,
                                              name=f"backbone_{module}")

                frame_idx = list(range(t))
                flow_idx = list(range(-1, t - 1))
                mapping_idx = list(range(t)) + list(range(t))[::-1]
                if direction == "backward":
                    frame_idx = frame_idx[::-1]
                    flow_idx = frame_idx
                feat_prop = jnp.zeros((b, fh, fw, mid))
                for i, idx in enumerate(frame_idx):
                    feat_current = feats["spatial"][mapping_idx[idx]]
                    if i > 0:
                        flow_n1 = flows[:, flow_idx[i]]
                        cond_n1 = flow_warp(feat_prop, flow_n1)
                        feat_n2 = jnp.zeros_like(feat_prop)
                        flow_n2 = jnp.zeros_like(flow_n1)
                        cond_n2 = jnp.zeros_like(cond_n1)
                        if i > 1:
                            feat_n2 = feats[module][-2]
                            flow_n2 = flows[:, flow_idx[i - 1]]
                            flow_n2 = flow_n1 + flow_warp(flow_n2, flow_n1)
                            cond_n2 = flow_warp(feat_n2, flow_n2)
                        cond = jnp.concatenate([cond_n1, feat_current, cond_n2],
                                               axis=-1)
                        feat_prop = align(
                            jnp.concatenate([feat_prop, feat_n2], axis=-1),
                            cond, flow_n1, flow_n2)
                    feat = ([feat_current]
                            + [feats[k][idx] for k in feats
                               if k not in ("spatial", module)]
                            + [feat_prop])
                    feat_prop = feat_prop + backbone(jnp.concatenate(feat, axis=-1))
                    feats[module].append(feat_prop)
                if direction == "backward":
                    feats[module] = feats[module][::-1]

        # reconstruction + upsample
        recon = ConvResidualBlocks(mid, 5, name="reconstruction")
        upconv1 = nn.Conv(mid * 4, (3, 3), padding="SAME", name="upconv1")
        upconv2 = nn.Conv(64 * 4, (3, 3), padding="SAME", name="upconv2")
        conv_hr = nn.Conv(64, (3, 3), padding="SAME", name="conv_hr")
        conv_last = nn.Conv(3, (3, 3), padding="SAME", name="conv_last")
        outs = []
        for i in range(t):
            hr = [feats["spatial"][i if i < t else 2 * t - 1 - i]]
            hr += [feats[k][i] for k in feats if k != "spatial"]
            hr = jnp.concatenate(hr, axis=-1)
            hr = recon(hr)
            hr = nn.leaky_relu(pixel_shuffle(upconv1(hr), 2), 0.1)
            hr = nn.leaky_relu(pixel_shuffle(upconv2(hr), 2), 0.1)
            hr = nn.leaky_relu(conv_hr(hr), 0.1)
            hr = conv_last(hr)
            if self.is_low_res_input:
                hr = hr + interp_bilinear(lqs[:, i], (4 * h, 4 * w),
                                          align_corners=False)
            else:
                hr = hr + lqs[:, i]
            outs.append(hr)
        return jnp.stack(outs, axis=1)


def _cubic_kernel(x, a=-0.75):
    """torch bicubic convolution kernel (A=-0.75)."""
    ax = jnp.abs(x)
    return jnp.where(
        ax <= 1, (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1,
        jnp.where(ax < 2, a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a, 0.0))


def _cubic_matrix(n_out, n_in):
    """Band matrix for F.interpolate(mode='bicubic', align_corners=False),
    no antialias (torch default)."""
    src = (jnp.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    i0 = jnp.floor(src).astype(jnp.int32)
    mat = jnp.zeros((n_out, n_in))
    rows = jnp.arange(n_out)
    for k in range(-1, 3):
        idx = jnp.clip(i0 + k, 0, n_in - 1)
        wgt = _cubic_kernel(src - (i0 + k).astype(jnp.float32))
        mat = mat.at[rows, idx].add(wgt)
    return mat


def _bicubic_resize_quarter(x):
    """F.interpolate(scale_factor=0.25, mode='bicubic') on NHWC."""
    bb, h, w, c = x.shape
    ay = _cubic_matrix(h // 4, h)
    ax = _cubic_matrix(w // 4, w)
    return jnp.einsum("yh,bhwc,xw->byxc", ay, x, ax)
