"""Exact torch-resize semantics as separable band matrices (differentiable).

Two resize flavors the BebyGAN-SSL recipe depends on, implemented as
precomputed (n_out, n_in) interpolation matrices applied with einsum — exact,
static-shape, MXU-friendly, and trivially differentiable:

1. ``interp_bicubic`` — ``F.interpolate(mode='bicubic', align_corners=False)``
   WITHOUT antialias (torch's UpSampleBicubic2d: cubic convolution a=-0.75,
   half-pixel source mapping, border-clamped taps).  Used for the BBL GT
   pyramid (reference bebyganssl_model.py:552-560).
2. ``bebygan_imresize_down`` — the reference's own differentiable imresize
   (bebyganssl_model.py:375-468) on its integer-downscale path: a discrete
   4s×4s antialiased cubic kernel (a=-0.5, ``discrete_kernel`` :133-163)
   applied as a depthwise conv with MATLAB-style edge-repeat reflect padding
   (``reflect_padding`` :164-196) and stride s (``downsampling_2d`` :351-373).
   Used for the back-projection LR loss (:724-728).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_conv1(x: np.ndarray, a: float) -> np.ndarray:
    # |x| <= 1 branch of the cubic convolution kernel
    return ((a + 2) * x - (a + 3)) * x * x + 1


def _cubic_conv2(x: np.ndarray, a: float) -> np.ndarray:
    # 1 < |x| < 2 branch
    return ((a * x - 5 * a) * x + 8 * a) * x - 4 * a


@lru_cache(maxsize=None)
def _bicubic_matrix_np(n_out: int, n_in: int, scale: float | None = None) -> np.ndarray:
    """Row matrix replicating torch upsample_bicubic2d (align_corners=False):
    src = (i+0.5)/scale-0.5 (scale = out/in, or the user's explicit
    scale_factor — torch uses the GIVEN factor directly when one is passed),
    4 taps at floor(src)-1..+2, indices clamped to the border, cubic weights
    with a=-0.75."""
    a = -0.75
    if n_out == n_in and scale is None:
        return np.eye(n_in, dtype=np.float64)
    src = (np.arange(n_out) + 0.5) / (scale if scale is not None else n_out / n_in) - 0.5
    i0 = np.floor(src)
    t = src - i0
    w = np.stack([
        _cubic_conv2(t + 1.0, a),
        _cubic_conv1(t, a),
        _cubic_conv1(1.0 - t, a),
        _cubic_conv2(2.0 - t, a),
    ], axis=1)  # (n_out, 4)
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for k in range(4):
        idx = np.clip(i0.astype(np.int64) - 1 + k, 0, n_in - 1)
        np.add.at(mat, (np.arange(n_out), idx), w[:, k])
    return mat


def interp_bicubic(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """``F.interpolate(x, size, mode='bicubic', align_corners=False)`` (no
    antialias) for NHWC input."""
    b, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    ay = jnp.asarray(_bicubic_matrix_np(oh, h), x.dtype)
    ax = jnp.asarray(_bicubic_matrix_np(ow, w), x.dtype)
    return jnp.einsum("yh,bhwc,xw->byxc", ay, x, ax)


@lru_cache(maxsize=None)
def _bilinear_matrix_np(n_out: int, n_in: int, scale: float | None = None) -> np.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False): half-pixel
    source mapping clamped at 0 (area_pixel_compute_source_index), 2 taps
    clamped to the border.  ``scale``: explicit scale_factor (torch maps
    coordinates with the given factor, not the out/in ratio)."""
    if n_out == n_in and scale is None:
        return np.eye(n_in, dtype=np.float64)
    src = (np.arange(n_out) + 0.5) / (scale if scale is not None else n_out / n_in) - 0.5
    src = np.clip(src, 0.0, None)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    frac = src - i0
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    rows = np.arange(n_out)
    np.add.at(mat, (rows, i0), 1.0 - frac)
    np.add.at(mat, (rows, i1), frac)
    return mat


@lru_cache(maxsize=None)
def _area_matrix_np(n_out: int, n_in: int) -> np.ndarray:
    """torch F.interpolate(mode='area') == adaptive_avg_pool: output cell i
    averages input cells floor(i*in/out) .. ceil((i+1)*in/out)-1 uniformly."""
    if n_out == n_in:
        return np.eye(n_in, dtype=np.float64)
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -((-(i + 1) * n_in) // n_out)  # ceil
        mat[i, lo:hi] = 1.0 / (hi - lo)
    return mat


_MATRIX_FNS = {"area": _area_matrix_np, "bilinear": _bilinear_matrix_np,
               "bicubic": _bicubic_matrix_np}


def torch_resize_np(img: np.ndarray, size: tuple[int, int], mode: str,
                    scale: float | None = None) -> np.ndarray:
    """Exact ``F.interpolate(img, size, mode=mode[, align_corners=False])``
    for a single HWC numpy image (host input pipeline; float32).  Pass
    ``scale`` when replicating a scale_factor call (coordinate mapping uses
    the given factor; 'area' ignores it — adaptive pooling)."""
    h, w = img.shape[:2]
    oh, ow = size
    if (oh, ow) == (h, w) and scale is None:
        return img
    fn = _MATRIX_FNS[mode]
    if mode == "area":
        ay, ax = fn(oh, h), fn(ow, w)
    else:
        ay, ax = fn(oh, h, scale), fn(ow, w, scale)
    ay = ay.astype(np.float32)
    ax = ax.astype(np.float32)
    tmp = ay @ img.reshape(h, -1)                       # (oh, w*c)
    c = img.shape[2] if img.ndim == 3 else 1
    tmp = tmp.reshape(oh, w, c).transpose(0, 2, 1)      # (oh, c, w)
    out = tmp @ ax.T                                    # (oh, c, ow)
    out = out.transpose(0, 2, 1)
    return out if img.ndim == 3 else out[..., 0]


def interp_torch(x: jnp.ndarray, size: tuple[int, int], mode: str) -> jnp.ndarray:
    """Exact torch-interpolate (area/bilinear/bicubic, align_corners=False,
    no antialias) for NHWC jnp input — the device-path twin of
    ``torch_resize_np`` (same cached matrices)."""
    b, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    fn = _MATRIX_FNS[mode]
    ay = jnp.asarray(fn(oh, h), x.dtype)
    ax = jnp.asarray(fn(ow, w), x.dtype)
    return jnp.einsum("yh,bhwc,xw->byxc", ay, x, ax)


@lru_cache(maxsize=None)
def _discrete_cubic_kernel_np(factor: int) -> np.ndarray:
    """reference discrete_kernel('cubic', 1/factor, antialiasing=True)
    (bebyganssl_model.py:133-163): separable cubic (a=-0.5) sampled on a
    symmetric grid of 4*factor points (odd factors drop one point)."""
    ks_orig = 4
    ks = ks_orig * factor
    if factor % 2 == 0:
        a_ext = ks_orig * (0.5 - 1.0 / (2 * ks))
    else:
        ks -= 1
        a_ext = ks_orig * (0.5 - 1.0 / (ks + 1))
    r = np.linspace(-a_ext, a_ext, ks)
    ax = np.abs(r)
    a = -0.5
    k1 = (_cubic_conv1(ax, a)) * (ax <= 1)
    k2 = (_cubic_conv2(ax, a)) * ((ax > 1) & (ax <= 2))
    k = k1 + k2
    k = k / k.sum()
    k2d = np.outer(k, k)
    return k2d / k2d.sum()


def _reflect_pad_matlab(x: jnp.ndarray, pad: int, axis: int) -> jnp.ndarray:
    """MATLAB-style reflect pad using boundary elements twice:
    [a,b,c,d] -> [b,a, a,b,c,d, d,c] for pad=2 (reference reflect_padding)."""
    if pad == 0:
        return x
    idx_pre = jnp.arange(pad - 1, -1, -1)
    n = x.shape[axis]
    idx_post = jnp.arange(n - 1, n - 1 - pad, -1)
    pre = jnp.take(x, idx_pre, axis=axis)
    post = jnp.take(x, idx_post, axis=axis)
    return jnp.concatenate([pre, x, post], axis=axis)


def bebygan_imresize_down(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Reference ``imresize(x, scale=1/factor)`` for integer factor (the only
    way the recipe calls it, :724-728): discrete antialiased cubic kernel +
    matlab-reflect pad + depthwise conv stride ``factor``.  NHWC."""
    k2d = jnp.asarray(_discrete_cubic_kernel_np(factor), x.dtype)
    kh, kw = k2d.shape
    pad_h = (kh - factor) // 2
    pad_w = (kw - factor) // 2
    xp = _reflect_pad_matlab(x, pad_h, axis=1)
    xp = _reflect_pad_matlab(xp, pad_w, axis=2)
    c = x.shape[-1]
    kern = jnp.tile(k2d[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    return jax.lax.conv_general_dilated(
        xp, kern, window_strides=(factor, factor), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
