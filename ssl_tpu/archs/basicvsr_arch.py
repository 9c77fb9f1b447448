"""Video SR: SPyNet optical flow + BasicVSR bidirectional recurrent SR.

Reference parity: diffusion-tree vendored basicsr archs (spynet_arch.py,
basicvsr_arch.py) — BasicSR inheritance, not on the SSL path.  NHWC flax;
flow warping is bilinear grid sampling expressed with gather-free floor/ceil
interpolation (same approach as ops/deform_conv.py)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.arch_util import ResidualBlockNoBN, pixel_shuffle, resize_bilinear
from ssl_tpu.utils.registry import ARCH_REGISTRY


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp x (b,h,w,c) by flow (b,h,w,2) [dy,dx order dx,dy as (x,y)]."""
    b, h, w, c = x.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = yy[None] + flow[..., 1]
    xs = xx[None] + flow[..., 0]

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
                valid = ((y0 + dy >= 0) & (y0 + dy < h) &
                         (x0 + dx >= 0) & (x0 + dx < w)).astype(img.dtype)
                out = out + img[yi, xi] * (wgt_y * wgt_x * valid)[..., None]
        return out

    return jax.vmap(sample_one)(x, ys, xs)


class _SPyNetLevel(nn.Module):
    @nn.compact
    def __call__(self, ref, supp, flow_up):
        inp = jnp.concatenate([ref, flow_warp(supp, flow_up), flow_up], axis=-1)
        y = inp
        for feats, k in ((32, 7), (64, 7), (32, 7), (16, 7), (2, 7)):
            y = nn.Conv(feats, (k, k), padding="SAME")(y)
            if feats != 2:
                y = nn.relu(y)
        return flow_up + y


@ARCH_REGISTRY.register()
class SPyNet(nn.Module):
    """Coarse-to-fine pyramid optical flow (reference spynet_arch.py)."""
    num_levels: int = 4

    @nn.compact
    def __call__(self, ref, supp):
        # build pyramids (avg-pool downsampling)
        refs, supps = [ref], [supp]
        for _ in range(self.num_levels - 1):
            refs.append(nn.avg_pool(refs[-1], (2, 2), strides=(2, 2)))
            supps.append(nn.avg_pool(supps[-1], (2, 2), strides=(2, 2)))
        b, h, w, _ = refs[-1].shape
        flow = jnp.zeros((b, h, w, 2))
        for lvl in reversed(range(self.num_levels)):
            if flow.shape[1] != refs[lvl].shape[1]:
                flow = 2.0 * jax.image.resize(
                    flow, (b, refs[lvl].shape[1], refs[lvl].shape[2], 2), "bilinear")
            flow = _SPyNetLevel(name=f"level_{lvl}")(refs[lvl], supps[lvl], flow)
        return flow


class _PropagationBranch(nn.Module):
    num_feat: int
    num_block: int

    @nn.compact
    def __call__(self, feat_prop, frame):
        y = jnp.concatenate([frame, feat_prop], axis=-1)
        y = nn.leaky_relu(nn.Conv(self.num_feat, (3, 3), padding="SAME")(y), 0.1)
        for i in range(self.num_block):
            y = ResidualBlockNoBN(self.num_feat, name=f"block_{i}")(y)
        return y


class _FlowGuidedDeformAlign(nn.Module):
    """BasicVSR++ second-order alignment: flow pre-warp + deformable residual
    offsets (reference basicvsrpp_arch.py SecondOrderDeformableAlignment)."""
    num_feat: int
    deform_groups: int = 8

    @nn.compact
    def __call__(self, feat_prop, cond, flow):
        from ssl_tpu.ops.deform_conv import modulated_deform_conv2d
        k = 3
        pred = nn.Conv(self.deform_groups * 3 * k * k, (3, 3), padding="SAME",
                       kernel_init=nn.initializers.zeros, name="conv_offset")(cond)
        o1, o2, m = jnp.split(pred, 3, axis=-1)
        # residual offsets around the optical flow (y,x interleave)
        base = jnp.stack([flow[..., 1], flow[..., 0]], axis=-1)  # (b,h,w,2) y,x
        off = jnp.stack([o1, o2], axis=-1)                        # (...,dgk2,2)
        off = off + base[:, :, :, None, :]
        offset = off.reshape(pred.shape[:3] + (-1,))
        mask = jax.nn.sigmoid(m)
        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (k, k, feat_prop.shape[-1], self.num_feat))
        bias = self.param("bias", nn.initializers.zeros, (self.num_feat,))
        return modulated_deform_conv2d(feat_prop, offset, mask, weight, bias,
                                       deform_groups=self.deform_groups)


@ARCH_REGISTRY.register()
class BasicVSRPlusPlus(nn.Module):
    """BasicVSR++ (reference basicvsrpp_arch.py), compact: one backward + one
    forward propagation branch with flow-guided deformable alignment.
    lqs (b,t,h,w,3) -> (b,t,4h,4w,3)."""
    num_feat: int = 64
    num_block: int = 7
    spynet_levels: int = 4
    deform_groups: int = 8

    @nn.compact
    def __call__(self, lqs):
        b, t, h, w, c = lqs.shape
        lrelu = lambda v: nn.leaky_relu(v, 0.1)
        spynet = SPyNet(self.spynet_levels, name="spynet")
        ref = lqs[:, 1:].reshape(-1, h, w, c)
        supp = lqs[:, :-1].reshape(-1, h, w, c)
        flow_fwd = spynet(ref, supp).reshape(b, t - 1, h, w, 2)
        flow_bwd = spynet(supp, ref).reshape(b, t - 1, h, w, 2)

        extract = _PropagationBranch(self.num_feat, 2, name="extract")
        feats = [extract(jnp.zeros((b, h, w, self.num_feat)), lqs[:, i])
                 for i in range(t)]

        align_b = _FlowGuidedDeformAlign(self.num_feat, self.deform_groups, name="align_b")
        branch_b = _PropagationBranch(self.num_feat, self.num_block, name="branch_b")
        prop_b = []
        feat = jnp.zeros((b, h, w, self.num_feat))
        for i in range(t - 1, -1, -1):
            if i < t - 1:
                flow = flow_bwd[:, i]
                cond = jnp.concatenate([flow_warp(feat, flow), feats[i]], axis=-1)
                feat = align_b(feat, cond, flow)
            feat = branch_b(feat, lqs[:, i])
            prop_b.insert(0, feat)

        align_f = _FlowGuidedDeformAlign(self.num_feat, self.deform_groups, name="align_f")
        branch_f = _PropagationBranch(self.num_feat, self.num_block, name="branch_f")
        fuse = nn.Conv(self.num_feat, (1, 1), name="fuse")
        up1 = nn.Conv(self.num_feat * 4, (3, 3), padding="SAME", name="up1")
        up2 = nn.Conv(self.num_feat * 4, (3, 3), padding="SAME", name="up2")
        hr = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="hr")
        last = nn.Conv(3, (3, 3), padding="SAME", name="last")

        outs = []
        feat = jnp.zeros((b, h, w, self.num_feat))
        for i in range(t):
            if i > 0:
                flow = flow_fwd[:, i - 1]
                cond = jnp.concatenate([flow_warp(feat, flow), feats[i]], axis=-1)
                feat = align_f(feat, cond, flow)
            feat = branch_f(feat, lqs[:, i])
            y = lrelu(fuse(jnp.concatenate([prop_b[i], feat], axis=-1)))
            y = pixel_shuffle(lrelu(up1(y)), 2)
            y = pixel_shuffle(lrelu(up2(y)), 2)
            y = last(lrelu(hr(y)))
            outs.append(y + resize_bilinear(lqs[:, i], 4))
        return jnp.stack(outs, axis=1)


@ARCH_REGISTRY.register()
class BasicVSR(nn.Module):
    """Bidirectional recurrent video SR (reference basicvsr_arch.py).

    lqs: (b, t, h, w, 3) -> (b, t, 4h, 4w, 3)."""
    num_feat: int = 64
    num_block: int = 15
    spynet_levels: int = 4

    @nn.compact
    def __call__(self, lqs):
        b, t, h, w, c = lqs.shape
        spynet = SPyNet(self.spynet_levels, name="spynet")
        backward_branch = _PropagationBranch(self.num_feat, self.num_block, name="backward")
        forward_branch = _PropagationBranch(self.num_feat, self.num_block, name="forward")

        # flows between neighbors
        ref = lqs[:, 1:].reshape(-1, h, w, c)
        supp = lqs[:, :-1].reshape(-1, h, w, c)
        flow_fwd = spynet(ref, supp).reshape(b, t - 1, h, w, 2)
        flow_bwd = spynet(supp, ref).reshape(b, t - 1, h, w, 2)

        # backward pass
        feats_bwd = []
        feat = jnp.zeros((b, h, w, self.num_feat))
        for i in range(t - 1, -1, -1):
            if i < t - 1:
                feat = flow_warp(feat, flow_bwd[:, i])
            feat = backward_branch(feat, lqs[:, i])
            feats_bwd.insert(0, feat)
        # shared reconstruction head (params reused across time steps)
        fuse = nn.Conv(self.num_feat, (1, 1), name="fuse")
        up1 = nn.Conv(self.num_feat * 4, (3, 3), padding="SAME", name="up1")
        up2 = nn.Conv(self.num_feat * 4, (3, 3), padding="SAME", name="up2")
        hr = nn.Conv(self.num_feat, (3, 3), padding="SAME", name="hr")
        last = nn.Conv(3, (3, 3), padding="SAME", name="last")

        # forward pass + upsample
        outs = []
        feat = jnp.zeros((b, h, w, self.num_feat))
        for i in range(t):
            if i > 0:
                feat = flow_warp(feat, flow_fwd[:, i - 1])
            feat = forward_branch(feat, lqs[:, i])
            y = jnp.concatenate([feats_bwd[i], feat], axis=-1)
            y = nn.leaky_relu(fuse(y), 0.1)
            y = pixel_shuffle(nn.leaky_relu(up1(y), 0.1), 2)
            y = pixel_shuffle(nn.leaky_relu(up2(y), 0.1), 2)
            y = nn.leaky_relu(hr(y), 0.1)
            y = last(y)
            outs.append(y + resize_bilinear(lqs[:, i], 4))
        return jnp.stack(outs, axis=1)
