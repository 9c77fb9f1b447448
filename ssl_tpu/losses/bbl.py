"""Best-Buddy Loss (BebyGAN) — jnp implementation.

Reference parity: models/bebyganssl_model.py:471-565 (BBL class): 3x3 stride-3
patches of SR are matched against the union of GT patches at scales
{1, 1/2, 1/4}; the best-buddy (min combined distance) GT patch becomes the
L1 target.  All distances are batched matmuls (MXU).

Exact resize semantics (oracle-tested in tests/test_bbl_parity.py):
the GT pyramid uses torch ``F.interpolate(mode='bicubic',
align_corners=False)`` WITHOUT antialias (:552-556) and the back-projection
term uses the reference's own differentiable imresize on its discrete-kernel
integer-downscale path (:375-468, :724-728) — both via ops/torch_resize.py
band matrices, NOT ``jax.image.resize`` (whose antialiased cubic picks
different pixels, hence different argmin buddies and a different loss
landscape)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssl_tpu.ops.torch_resize import bebygan_imresize_down, interp_bicubic


def _unfold_patches(x: jnp.ndarray, ksize: int, stride: int) -> jnp.ndarray:
    """NHWC -> (b, n_patches, c*ksize*ksize), valid grid (pad=0) like
    reference F.unfold(kernel_size=ksize, padding=0, stride=stride)."""
    b, h, w, c = x.shape
    nh = (h - ksize) // stride + 1
    nw = (w - ksize) // stride + 1
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
    gt2 = interp_bicubic(gt, (h // 2, w // 2))
    gt4 = interp_bicubic(gt, (h // 4, w // 4))
    p2_cat = jnp.concatenate([p2, _unfold_patches(gt2, ksize, stride),
                              _unfold_patches(gt4, ksize, stride)], axis=1)
    score = alpha * _pairwise_sqdist(p1, p2_cat) + beta * _pairwise_sqdist(p2, p2_cat)
    ind = jnp.argmin(score, axis=2)                       # (b, n)
    sel = jnp.take_along_axis(p2_cat, ind[..., None], axis=1)
    return p1, jax.lax.stop_gradient(sel)


def back_projection_loss(sr: jnp.ndarray, lq: jnp.ndarray) -> jnp.ndarray:
    """L1 between downscaled SR and the LQ input (reference
    bebyganssl_model.py:724-728, imresize(scale=1/s) discrete-kernel path)."""
    factor = sr.shape[1] // lq.shape[1]
    sr_down = bebygan_imresize_down(sr, factor)
    return jnp.mean(jnp.abs(sr_down - lq))
