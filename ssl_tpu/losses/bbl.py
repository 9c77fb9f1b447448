"""Best-Buddy Loss (BebyGAN) — jnp implementation.

Reference parity: models/bebyganssl_model.py:471-565 (BBL class): 3x3 stride-3
patches of SR are matched against the union of GT patches at scales
{1, 1/2, 1/4}; the best-buddy (min combined distance) GT patch becomes the
L1 target.  All distances are batched matmuls (MXU)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unfold_patches(x: jnp.ndarray, ksize: int, stride: int) -> jnp.ndarray:
    """NHWC -> (b, n_patches, ksize*ksize*c), zero-pad none (valid grid)."""
    b, h, w, c = x.shape
    nh = (h - ksize) // stride + 1
    nw = (w - ksize) // stride + 1
    idx_h = jnp.arange(nh) * stride
    idx_w = jnp.arange(nw) * stride
    # gather patches via dynamic slices over a meshgrid (vectorized reshape path)
    patches = jax.lax.conv_general_dilated_patches(
        x.transpose(0, 3, 1, 2), (ksize, ksize), (stride, stride), "VALID")
    # output (b, c*k*k, nh, nw) -> (b, nh*nw, c*k*k)
    return patches.reshape(b, -1, nh * nw).transpose(0, 2, 1)


def _pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    xn = jnp.sum(x ** 2, axis=2)[:, :, None]
    yn = jnp.sum(y ** 2, axis=2)[:, None, :]
    d = xn + yn - 2.0 * jnp.einsum("bnd,bmd->bnm", x, y)
    return jnp.maximum(d, 0.0)


def best_buddy_pairs(sr: jnp.ndarray, gt: jnp.ndarray, alpha=1.0, beta=1.0,
                     ksize=3, stride=3):
    """Returns (sr_patches, matched_gt_patches) for an L1 criterion."""
    p1 = _unfold_patches(sr, ksize, stride)
    p2 = _unfold_patches(gt, ksize, stride)
    b, h, w, c = gt.shape
    gt2 = jax.image.resize(gt, (b, h // 2, w // 2, c), method="cubic")
    gt4 = jax.image.resize(gt, (b, h // 4, w // 4, c), method="cubic")
    p2_cat = jnp.concatenate([p2, _unfold_patches(gt2, ksize, stride),
                              _unfold_patches(gt4, ksize, stride)], axis=1)
    score = alpha * _pairwise_sqdist(p1, p2_cat) + beta * _pairwise_sqdist(p2, p2_cat)
    ind = jnp.argmin(score, axis=2)                       # (b, n)
    sel = jnp.take_along_axis(p2_cat, ind[..., None], axis=1)
    return p1, jax.lax.stop_gradient(sel)


def back_projection_loss(sr: jnp.ndarray, lq: jnp.ndarray) -> jnp.ndarray:
    """L1 between bicubic-downscaled SR and the LQ input (reference
    bebyganssl_model.py:724-728 with differentiable imresize :375-468)."""
    b, h, w, c = lq.shape
    sr_down = jax.image.resize(sr, (b, h, w, c), method="cubic")
    return jnp.mean(jnp.abs(sr_down - lq))
