"""On-device image processing: per-sample-kernel filtering + USM sharpening.

Reference parity: utils/img_process_util.py (filter2D :7-31 — grouped conv
with a different kernel per batch item; usm_sharp :34-84).  jnp/NHWC; the
host-side numpy twins live in data/realesr_degradation.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """img (b,h,w,c), kernel (b,k,k) — each batch item filtered by its own
    kernel with reflect padding (the reference's grouped-conv trick)."""
    b, h, w, c = img.shape
    k = kernel.shape[-1]
    pad = k // 2
    imgp = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    def one(im, ker):
        # depthwise conv: same kernel across channels
        kr = jnp.tile(ker[..., None, None], (1, 1, 1, c))
        return lax.conv_general_dilated(
            im[None], kr, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)[0]

    return jax.vmap(one)(imgp, kernel)


def _gaussian_kernel1d(radius: int) -> jnp.ndarray:
    # cv2.GaussianBlur default sigma for ksize: 0.3*((k-1)*0.5 - 1) + 0.8
    k = 2 * (radius // 2) + 1
    sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
    ax = jnp.arange(k) - k // 2
    g = jnp.exp(-(ax ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def usm_sharp(img: jnp.ndarray, weight: float = 0.5, radius: int = 50,
              threshold: int = 10) -> jnp.ndarray:
    """Unsharp masking, NHWC batch (reference usm_sharp semantics)."""
    if radius % 2 == 0:
        radius += 1
    g1 = _gaussian_kernel1d(radius)
    k2 = jnp.outer(g1, g1)
    b = img.shape[0]
    kb = jnp.broadcast_to(k2, (b,) + k2.shape)
    blur = filter2d(img, kb)
    residual = img - blur
    mask = (jnp.abs(residual) * 255 > threshold).astype(img.dtype)
    soft_mask = filter2d(mask, kb)
    sharp = jnp.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img
