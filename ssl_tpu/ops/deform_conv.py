"""Modulated deformable convolution v2 — TPU-native (SURVEY §2.1 N2).

Reference: basicsr/ops/dcn/ (685 LoC C++ + 867 LoC CUDA, hand-written
fwd/bwd).  TPU re-design: the per-output-location bilinear sampling becomes a
dense gather-free formulation — offsets produce sampling coordinates, bilinear
interpolation is expressed with integer-floor gathers via jnp.take (XLA
lowers small gathers fine at these sizes) and everything is autodiff'd; no
hand-written backward.  Used by DCNv2Pack (video-SR alignment, e.g. EDVR);
not on any SSL training path."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """img (h, w, c); ys/xs (...) float coords. Zero padding outside."""
    h, w, c = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    out = 0.0
    for dy, wy in ((0, 1 - wy1), (1, wy1)):
        for dx, wx in ((0, 1 - wx1), (1, wx1)):
            yy = (y0 + dy).astype(jnp.int32)
            xx = (x0 + dx).astype(jnp.int32)
            valid = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)).astype(img.dtype)
            yyc = jnp.clip(yy, 0, h - 1)
            xxc = jnp.clip(xx, 0, w - 1)
            vals = img[yyc, xxc]                     # (..., c)
            out = out + vals * (wy * wx * valid)[..., None]
    return out


def modulated_deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                            weight: jnp.ndarray, bias: jnp.ndarray | None = None,
                            stride: int = 1, padding: int = 1,
                            deform_groups: int = 1) -> jnp.ndarray:
    """DCNv2 forward (autodiff gives the backward).

    x: (b, h, w, cin) NHWC; offset: (b, ho, wo, 2*dg*kh*kw) (y,x interleaved
    like the reference layout); mask: (b, ho, wo, dg*kh*kw) in [0,1];
    weight: (kh, kw, cin, cout)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1
    dg = deform_groups
    cg = cin // dg

    base_y = jnp.arange(ho) * stride - padding
    base_x = jnp.arange(wo) * stride - padding
    ky = jnp.arange(kh)
    kx = jnp.arange(kw)
    # grid coords per (ho, wo, kh, kw)
    gy = base_y[:, None, None, None] + ky[None, None, :, None]
    gx = base_x[None, :, None, None] + kx[None, None, None, :]

    offset = offset.reshape(b, ho, wo, dg, kh, kw, 2)
    mask = mask.reshape(b, ho, wo, dg, kh, kw)

    def per_image(xi, off_i, m_i):
        cols = []
        for g in range(dg):
            ys = gy[None].squeeze(0) + off_i[..., g, :, :, 0]      # (ho,wo,kh,kw)
            xs = gx[None].squeeze(0) + off_i[..., g, :, :, 1]
            samp = _bilinear_sample(xi[..., g * cg:(g + 1) * cg], ys, xs)
            cols.append(samp * m_i[..., g, :, :][..., None])
        return jnp.concatenate(cols, axis=-1)                      # (ho,wo,kh,kw,cin)

    cols = jax.vmap(per_image)(x, offset, mask)                    # (b,ho,wo,kh,kw,cin)
    out = jnp.einsum("bhwklc,klco->bhwo", cols, weight)
    if bias is not None:
        out = out + bias
    return out


class DCNv2Pack:
    """Functional DCNv2Pack: offsets/masks predicted from features
    (reference arch_util.py:205).  Parameters are plain arrays in a dict."""

    @staticmethod
    def init_params(rng, cin, cout, k=3, deform_groups=1):
        k1, k2 = jax.random.split(rng)
        scale = 1.0 / np.sqrt(cin * k * k)
        return {
            "weight": jax.random.uniform(k1, (k, k, cin, cout), minval=-scale, maxval=scale),
            "bias": jnp.zeros((cout,)),
            "conv_offset": {
                "kernel": jnp.zeros((k, k, cin, deform_groups * 3 * k * k)),
                "bias": jnp.zeros((deform_groups * 3 * k * k,)),
            },
        }

    @staticmethod
    def apply(params, x, feat, stride=1, padding=1, deform_groups=1):
        k = params["weight"].shape[0]
        pred = lax.conv_general_dilated(
            feat, params["conv_offset"]["kernel"], (stride, stride),
            [(padding, padding), (padding, padding)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["conv_offset"]["bias"]
        o1, o2, m = jnp.split(pred, 3, axis=-1)
        offset = jnp.stack([o1, o2], axis=-1).reshape(pred.shape[:3] + (-1,))
        mask = jax.nn.sigmoid(m)
        return modulated_deform_conv2d(x, offset, mask, params["weight"],
                                       params["bias"], stride, padding, deform_groups)
