"""Deformable attention — TPU-native (SURVEY §2.1 N5, the KAIR op pack).

Reference: train_BSGRAN/models/op/deform_attn.py + deform_attn_cuda_pt110.cpp
(VRT/RVRT guided-deformable-attention: for every query pixel, bilinearly
sample a kernel_h×kernel_w window of K and V at offset-deformed locations
from each of `clip_size` frames, then per-head attention of the query against
the clip_size·kernel² sampled keys; scale = head_dim^-0.5, softmax over the
sampled axis — deform_attn_cuda_pt110.cpp:79-111).

TPU re-design (like ops/deform_conv.py): sampling is a dense bilinear gather
under autodiff — no hand-written backward, no atomics; the attention is an
einsum pair that rides the MXU.  Layouts are channel-last: q (b, h, w, c),
kv (b, clip, h, w, 2c), offset (b, h, w, clip·dg·K·2) with (y, x) pairs
grouped like the reference's conv_offset output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssl_tpu.ops.deform_conv import _bilinear_sample


def deform_attn(q: jnp.ndarray, kv: jnp.ndarray, offset: jnp.ndarray,
                kernel_h: int = 3, kernel_w: int = 3, heads: int = 12,
                deform_groups: int = 12) -> jnp.ndarray:
    """q: (b,h,w,c); kv: (b,clip,h,w,2c); offset: (b,h,w,clip*dg*K*2).

    Returns (b,h,w,c) — attention-weighted sum of deform-sampled values."""
    b, h, w, c = q.shape
    clip = kv.shape[1]
    K = kernel_h * kernel_w
    dg = deform_groups
    hd = c // heads
    pad_h, pad_w = kernel_h // 2, kernel_w // 2

    # base grid: window around each pixel (stride 1, dilation 1)
    gy = (jnp.arange(h)[:, None] + jnp.arange(kernel_h)[None] - pad_h)  # (h, kh)
    gx = (jnp.arange(w)[:, None] + jnp.arange(kernel_w)[None] - pad_w)  # (w, kw)
    base_y = jnp.broadcast_to(gy[:, None, :, None], (h, w, kernel_h, kernel_w))
    base_x = jnp.broadcast_to(gx[None, :, None, :], (h, w, kernel_h, kernel_w))
    base_y = base_y.reshape(h, w, K).astype(jnp.float32)
    base_x = base_x.reshape(h, w, K).astype(jnp.float32)

    # offsets: (b,h,w, clip, dg, K, 2) with [..., 0]=dy, [..., 1]=dx
    off = offset.reshape(b, h, w, clip, dg, K, 2)

    def per_image(qi, kvi, offi):
        # sample K and V for every (clip, group, window) position
        def per_clip(kv_t, off_t):                      # kv_t (h,w,2c); off_t (h,w,dg,K,2)
            ys = base_y[:, :, None, :] + off_t[..., 0]  # (h,w,dg,K)
            xs = base_x[:, :, None, :] + off_t[..., 1]
            kv_g = kv_t.reshape(h, w, 2, dg, c // dg)

            def per_group(g):
                img = kv_g[:, :, :, g, :].reshape(h, w, 2 * (c // dg))
                return _bilinear_sample(img, ys[:, :, g], xs[:, :, g])  # (h,w,K,2cg)

            samp = jnp.stack([per_group(g) for g in range(dg)], axis=2)
            # (h, w, dg, K, 2*cg) -> split k/v -> (h, w, K, c)
            samp = samp.reshape(h, w, dg, K, 2, c // dg)
            k_s = samp[..., 0, :].transpose(0, 1, 3, 2, 4).reshape(h, w, K, c)
            v_s = samp[..., 1, :].transpose(0, 1, 3, 2, 4).reshape(h, w, K, c)
            return k_s, v_s

        ks, vs = jax.vmap(per_clip)(kvi, offi.transpose(2, 0, 1, 3, 4, 5))
        # ks/vs: (clip, h, w, K, c) -> (h, w, clip*K, heads, hd)
        ks = ks.transpose(1, 2, 0, 3, 4).reshape(h, w, clip * K, heads, hd)
        vs = vs.transpose(1, 2, 0, 3, 4).reshape(h, w, clip * K, heads, hd)
        qh = qi.reshape(h, w, heads, hd) * (hd ** -0.5)
        attn = jax.nn.softmax(
            jnp.einsum("ywhd,ywkhd->ywhk", qh, ks), axis=-1)
        out = jnp.einsum("ywhk,ywkhd->ywhd", attn, vs)
        return out.reshape(h, w, c)

    return jax.vmap(per_image)(q, kv, off)


class DeformAttnPack:
    """Functional equivalent of the reference DeformAttnPack (deform_attn.py:151):
    learned q/k/v projections, offsets from a zero-init conv over [q, k],
    deformable attention, then a residual 2x-MLP."""

    @staticmethod
    def init_params(rng, c, clip_size=1, deform_groups=12, kernel=3):
        import numpy as np
        rngs = jax.random.split(rng, 6)
        K = kernel * kernel

        def dense(r, cin, cout):
            return {"kernel": jax.random.normal(r, (cin, cout)) * (cin ** -0.5),
                    "bias": jnp.zeros((cout,))}

        return {
            "proj_q": dense(rngs[0], c, c), "proj_k": dense(rngs[1], c, c),
            "proj_v": dense(rngs[2], c, c),
            "mlp_fc1": dense(rngs[3], c, 2 * c), "mlp_fc2": dense(rngs[4], 2 * c, c),
            # zero-init offset conv (reference init_weight zeroes it)
            "conv_offset": {"kernel": jnp.zeros((3, 3, c * (1 + clip_size),
                                                 clip_size * deform_groups * K * 2)),
                            "bias": jnp.zeros((clip_size * deform_groups * K * 2,))},
        }

    @staticmethod
    def apply(params, q, k, v, heads=12, deform_groups=12, kernel=3):
        """q (b,h,w,c); k, v (b,clip,h,w,c)."""
        from jax import lax
        b, h, w, c = q.shape
        clip = k.shape[1]
        lin = lambda p, x: x @ p["kernel"] + p["bias"]
        feat = jnp.concatenate([q] + [k[:, t] for t in range(clip)], axis=-1)
        offset = lax.conv_general_dilated(
            feat, params["conv_offset"]["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["conv_offset"]["bias"]
        qp = lin(params["proj_q"], q)
        kv = jnp.concatenate([lin(params["proj_k"], k), lin(params["proj_v"], v)],
                             axis=-1)
        out = deform_attn(qp, kv, offset, kernel, kernel, heads, deform_groups)
        y = lin(params["mlp_fc2"], jax.nn.gelu(lin(params["mlp_fc1"], out),
                                               approximate=False))
        return out + y
