"""The diffusion tree's full ``simself_strategy`` zoo, TPU-native.

Reference spec: Diffusion-Based-SR/basicsr/losses/loss_util.py:183-1519
(class ``similarity_map`` + the module-level ``self_similarity`` /
``gradient_img_similarity`` / ``trainable_similarity_map`` /
``judge_abnormal_pixel``).  Every branch of the reference's dispatch
(loss_util.py:269-363) is implemented here as a pure jnp function and
oracle-parity-tested against the reference's own torch code
(tests/test_simself_strategies.py).  The one exception is
``areaarea_mask_nonlocalavg_cuda_v1_p`` (loss_util.py:362): its method body
is commented out in the reference (:1401-1415), so selecting it raises
AttributeError *in the reference itself* — we raise a descriptive error.

Three structurally different families:

* dense tile strategies (imgimg / gradimg / gradgrad / areaarea*): the image
  is split into a static (dh, dw) tile grid and per-tile Gram / SSD matrices
  are batched einsums — fully static shapes, jit-clean.
* masked strategies, pure-torch semantics (areaarea_mask_nonlocal / _trans /
  _slow / _patch / mutual): per-masked-pixel search tiles.  NOTE these have
  *different boundary semantics from the CUDA op*: the reference extracts a
  ``ks x ks`` tile per center from the reflect-padded image and then unfolds
  the center neighborhoods with ZERO padding inside the tile
  (loss_util.py:752-756), so window pixels beyond the tile edge read zeros.
  ``_slow`` instead reflect-pads the tile and takes the center neighborhood
  from the reflect-padded full image (:809-824) — genuinely different values;
  both are mirrored exactly.
* CUDA-op epilogues (``*_cuda_v*``): thin epilogues (loss_util.py:1180-1399)
  over the raw SSD map of the reference's similarity.cu kernel — served by
  the already-oracle-verified ``ops.ssg`` primitive (the .cu files of the GAN
  and diffusion trees are identical).

Positions are fixed-capacity (``mask_to_positions``) so the masked families
stay jit-compatible; rows for invalid positions are garbage and must be
masked by the caller (``simself_strategy_loss`` does).  Eager callers can
pass ``capacity=None`` to size from the concrete mask (exact reference
shapes, including the skip-empty-tile concat of the _patch variants).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ssl_tpu.ops.ssg import (SSGConfig, mask_to_positions, reflect_pad_2d,
                             ssg_ssd_maps_scan)


class SimMap(NamedTuple):
    """Result bundle mirroring the reference class attributes."""
    s: jnp.ndarray
    s1: Optional[jnp.ndarray] = None          # mutual / maxh variants
    index: Optional[jnp.ndarray] = None       # gradfilter
    valid: Optional[jnp.ndarray] = None       # per-row validity (capacity mode)

    def getitem(self):
        return self.s

    def getitem_simmutual(self):
        return self.s, self.s1

    def getitem_gradfilter(self):
        return self.s, self.index


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _unfold(x: jnp.ndarray, k: int, stride: int = 1, padding: int = 0,
            pad_mode: str = "zero") -> jnp.ndarray:
    """torch.nn.functional.unfold semantics: (b,c,h,w) -> (b, c*k*k, L).

    Block-element order is channel-major then (ky, kx) row-major; output
    positions L are row-major — both match torch exactly.
    """
    if padding:
        if pad_mode == "zero":
            x = jnp.pad(x, ((0, 0), (0, 0), (padding, padding), (padding, padding)))
        else:
            x = reflect_pad_2d(x, padding)
    b, c, h, w = x.shape
    oh = (h - k) // stride + 1
    ow = (w - k) // stride + 1
    cols = []
    for ky in range(k):
        for kx in range(k):
            cols.append(lax.slice(
                x, (0, 0, ky, kx),
                (b, c, ky + (oh - 1) * stride + 1, kx + (ow - 1) * stride + 1),
                (1, 1, stride, stride)))
    out = jnp.stack(cols, axis=2)                       # (b, c, k*k, oh, ow)
    return out.reshape(b, c * k * k, oh * ow)


def _tiles(x: jnp.ndarray, dh: int, dw: int) -> jnp.ndarray:
    """(b,c,(H dh),(W dw)) -> (b, H, W, dh*dw, c) patch-token layout
    (the reference's ``rearrange('b c (h dh) (w dw) -> b h w (dh dw) c')``)."""
    b, c, hh, ww = x.shape
    H, W = hh // dh, ww // dw
    x = x.reshape(b, c, H, dh, W, dw)
    return x.transpose(0, 2, 4, 3, 5, 1).reshape(b, H, W, dh * dw, c)


def _untile(s: jnp.ndarray, dh: int, dw: int) -> jnp.ndarray:
    """(b, H, W, dh*dw, C) -> (b, C, (H dh), (W dw)) — the reference's
    ``rearrange('b h w (dh dw) C -> b C (h dh) (w dw)')``."""
    b, H, W, _, C = s.shape
    s = s.reshape(b, H, W, dh, dw, C)
    return s.transpose(0, 5, 1, 3, 2, 4).reshape(b, C, H * dh, W * dw)


def _tile_grid(x: jnp.ndarray, dh: int, dw: int) -> jnp.ndarray:
    """(b,c,(H dh),(W dw)) -> (b, H*W, c, dh, dw) (loss_util.py:1199-1201)."""
    b, c, hh, ww = x.shape
    H, W = hh // dh, ww // dw
    x = x.reshape(b, c, H, dh, W, dw)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(b, H * W, c, dh, dw)


def _roll(x, sh, sw, dims):
    return jnp.roll(x, (sh, sw), axis=dims)


def _softmax(s):
    return jax.nn.softmax(s, axis=-1)


def get_gradient(x: jnp.ndarray) -> jnp.ndarray:
    """Central-difference gradient magnitude, per channel, zero padding
    (loss_util.py:197-218; cross-correlation with the v/h stencils)."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    gv = xp[:, :, 2:, 1:-1] - xp[:, :, :-2, 1:-1]
    gh = xp[:, :, 1:-1, 2:] - xp[:, :, 1:-1, :-2]
    return jnp.sqrt(gv * gv + gh * gh + 1e-6)


def _gray(img: jnp.ndarray) -> jnp.ndarray:
    return ((img[:, 0] + img[:, 1] + img[:, 2]) / 3)[:, None]


def _area_tokens(img, dh, dw, kernel_size, stride=1, pad_mode="zero",
                 padding=None):
    """Shared areaarea front-end: per-tile unfolded neighborhoods.

    Returns (b, H, W, T, c, k*k) where T is tokens per tile
    (dh*dw for stride 1).  Mirrors loss_util.py:432-441: tiles are laid out
    as a (b, c*H*W, dh, dw) image and unfolded, so neighborhoods never cross
    tile borders (zero or reflect padding *per tile*).
    """
    b, c, hh, ww = img.shape
    H, W = hh // dh, ww // dw
    q = img.reshape(b, c, H, dh, W, dw).transpose(0, 1, 2, 4, 3, 5)
    q = q.reshape(b, c * H * W, dh, dw)
    if padding is None:
        padding = kernel_size // 2
    q = _unfold(q, kernel_size, stride=stride, padding=padding, pad_mode=pad_mode)
    t = q.shape[-1]                                      # tokens per tile
    q = q.reshape(b, c, H * W, kernel_size * kernel_size, t)
    q = q.transpose(0, 2, 4, 1, 3)                       # b, HW, T, c, k*k
    return q.reshape(b, H, W, t, c, kernel_size * kernel_size)


# ---------------------------------------------------------------------------
# dense tile strategies
# ---------------------------------------------------------------------------

def simself_imgimg(img, is_shift=False, shift_h=16, shift_w=16, dh=32, dw=32,
                   softmax=True) -> SimMap:
    x = _roll(img, -shift_h, -shift_w, (2, 3)) if is_shift else img
    q = _tiles(x, dh, dw)
    s = jnp.einsum("bhwtc,bhwuc->bhwtu", q, q)
    if softmax:
        s = _softmax(s)
    s = _untile(s, dh, dw)
    if is_shift:
        s = _roll(s, shift_h, shift_w, (1, 2))   # reference rolls dims (1,2)
    return SimMap(s=s)


def self_similarity(tensor, is_shift=False, shift_h=4, shift_w=4,
                    dh=32, dw=32) -> jnp.ndarray:
    """Module-level helper (loss_util.py:183-194): always softmax."""
    return simself_imgimg(tensor, is_shift, shift_h, shift_w, dh, dw,
                          softmax=True).s


def simself_gradimg(img, is_shift=False, shift_h=4, shift_w=4, dh=32, dw=32,
                    gray=False, threshold=2e-3, softmax=True) -> SimMap:
    x = _gray(img) if gray else img
    grad = get_gradient(x)
    grad = jnp.where(grad <= threshold, 0.0, grad)
    if is_shift:
        grad = _roll(grad, -shift_h, -shift_w, (2, 3))
        x = _roll(x, -shift_h, -shift_w, (2, 3))
    qg, qi = _tiles(grad, dh, dw), _tiles(x, dh, dw)
    s = jnp.einsum("bhwtc,bhwuc->bhwtu", qg, qi)
    if softmax:
        s = _softmax(s)
    s = _untile(s, dh, dw)
    if is_shift:
        s = _roll(s, shift_h, shift_w, (1, 2))
    return SimMap(s=s)


def gradient_img_similarity(img, is_shift=False, shift_h=16, shift_w=16,
                            dh=32, dw=32, gray=False, threshold=1e-3):
    """Module-level helper (loss_util.py:221-240); always softmax."""
    return simself_gradimg(img, is_shift, shift_h, shift_w, dh, dw, gray,
                           threshold, softmax=True).s


def simself_gradgrad(img, is_shift=False, shift_h=4, shift_w=4, dh=32, dw=32,
                     gray=False, threshold=2e-3) -> SimMap:
    x = _gray(img) if gray else img
    grad = get_gradient(x)
    grad = jnp.where(grad <= threshold, 0.0, grad)
    if is_shift:
        grad = _roll(grad, -shift_h, -shift_w, (2, 3))
    q = _tiles(grad, dh, dw)
    s = _softmax(jnp.einsum("bhwtc,bhwuc->bhwtu", q, q))
    s = _untile(s, dh, dw)
    if is_shift:
        s = _roll(s, shift_h, shift_w, (1, 2))
    return SimMap(s=s)


def _area_epilogue(s, dh, dw, softmax, rearrange_back, crossentropy,
                   temperature, is_shift, shift_h, shift_w, roll_dims=(1, 2)):
    b, H, W, t, _ = s.shape
    if temperature != 0:
        s = s / temperature
    if softmax:
        s = _softmax(s)
    if crossentropy:
        return s.reshape(b * H * W * t, t)
    if rearrange_back:
        s = _untile(s, dh, dw)
        if is_shift:
            s = _roll(s, shift_h, shift_w, roll_dims)
    return s


def simself_areaarea(img, is_shift=False, shift_h=4, shift_w=4, dh=32, dw=32,
                     kernel_size=5, softmax=True, rearrange_back=True,
                     crossentropy=False, temperature=1, mean=False) -> SimMap:
    x = _roll(img, -shift_h, -shift_w, (2, 3)) if is_shift else img
    q = _area_tokens(x, dh, dw, kernel_size)             # b,H,W,T,c,k²
    if mean:
        q = q - jnp.mean(q, axis=-1, keepdims=True)
    b, H, W, t, c, kk = q.shape
    q = q.reshape(b, H, W, t, c * kk)
    s = jnp.einsum("bhwtf,bhwuf->bhwtu", q, q)
    s = _area_epilogue(s, dh, dw, softmax, rearrange_back, crossentropy,
                       temperature, is_shift, shift_h, shift_w)
    return SimMap(s=s)


def simself_areaarea_ori(img, is_shift=False, shift_h=4, shift_w=4, dh=32,
                         dw=32, kernel_size=5, mean=False) -> SimMap:
    x = _roll(img, -shift_h, -shift_w, (2, 3)) if is_shift else img
    q = _area_tokens(x, dh, dw, kernel_size)
    if mean:
        q = q - jnp.mean(q, axis=-1, keepdims=True)
    b, H, W, t, c, kk = q.shape
    q = q.reshape(b, H, W, t, c * kk)
    s = _softmax(jnp.einsum("bhwtf,bhwuf->bhwtu", q, q))
    s = _untile(s, dh, dw)
    if is_shift:
        s = _roll(s, shift_h, shift_w, (2, 3))   # _ori rolls (2,3), not (1,2)
    return SimMap(s=s)


def _pairwise_ssd(q):
    """(.., T, F) -> (.., T, T) squared L2 distances via the Gram identity."""
    sq = jnp.sum(q * q, axis=-1)
    g = jnp.einsum("...tf,...uf->...tu", q, q)
    d = sq[..., :, None] + sq[..., None, :] - 2.0 * g
    return jnp.maximum(d, 0.0)


def simself_areaarea_nonlocal(img, is_shift=False, shift_h=4, shift_w=4,
                              dh=32, dw=32, kernel_size=3,
                              scaling_factor=1) -> SimMap:
    x = _roll(img, -shift_h, -shift_w, (2, 3)) if is_shift else img
    q = _area_tokens(x, dh, dw, kernel_size)
    b, H, W, t, c, kk = q.shape
    q = q.reshape(b, H, W, t, c * kk)
    d = _pairwise_ssd(q) / (c * float(kernel_size) ** 2)
    s = jnp.exp(-d / scaling_factor)
    s = s / (jnp.sum(s, axis=-1, keepdims=True) + 1e-6)
    s = _untile(s, dh, dw)
    if is_shift:
        s = _roll(s, shift_h, shift_w, (1, 2))
    return SimMap(s=s)


def simself_areaarea_nonlocal_slow(img, is_shift=False, shift_h=4, shift_w=4,
                                   dh=32, dw=32, kernel_size=3,
                                   scaling_factor=1) -> SimMap:
    """Same SSD map as _nonlocal but normalized by the GLOBAL max
    (loss_util.py:536-537), not row sums."""
    x = _roll(img, -shift_h, -shift_w, (2, 3)) if is_shift else img
    q = _area_tokens(x, dh, dw, kernel_size)
    b, H, W, t, c, kk = q.shape
    q = q.reshape(b, H, W, t, c * kk)
    d = _pairwise_ssd(q) / (c * float(kernel_size) ** 2)
    s = jnp.exp(-d / scaling_factor)
    s = s / jnp.max(s)
    s = _untile(s, dh, dw)
    if is_shift:
        s = _roll(s, shift_h, shift_w, (1, 2))
    return SimMap(s=s)


def simself_areaarea_cos(img, is_shift=False, shift_h=4, shift_w=4, dh=32,
                         dw=32, kernel_size=5, softmax=True,
                         rearrange_back=True, crossentropy=False,
                         temperature=1) -> SimMap:
    x = _roll(img, -shift_h, -shift_w, (2, 3)) if is_shift else img
    q = _area_tokens(x, dh, dw, kernel_size)
    b, H, W, t, c, kk = q.shape
    q = q.reshape(b, H, W, t, c * kk)
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
    s = jnp.einsum("bhwtf,bhwuf->bhwtu", q, q)
    s = _area_epilogue(s, dh, dw, softmax, rearrange_back, crossentropy,
                       temperature, is_shift, shift_h, shift_w)
    return SimMap(s=s)


def simself_areaarea_stride(img, is_shift=False, shift_h=4, shift_w=4, dh=32,
                            dw=32, kernel_size=5, softmax=True,
                            rearrange_back=True, crossentropy=False,
                            temperature=1, stride=1) -> SimMap:
    x = _roll(img, -shift_h, -shift_w, (2, 3)) if is_shift else img
    pad = math.ceil((kernel_size - stride) / 2)
    q = _area_tokens(x, dh, dw, kernel_size, stride=stride, padding=pad)
    b, H, W, t, c, kk = q.shape
    q = q.reshape(b, H, W, t, c * kk)
    s = jnp.einsum("bhwtf,bhwuf->bhwtu", q, q)
    dh1, dw1 = dh // stride, dw // stride
    s = _area_epilogue(s, dh1, dw1, softmax, rearrange_back, crossentropy,
                       temperature, is_shift, shift_h, shift_w)
    return SimMap(s=s)


def simself_areaarea_pad_roll(img, is_shift=False, shift_h=4, shift_w=4,
                              dh=32, dw=32, kernel_size=5, softmax=True,
                              rearrange_back=True, crossentropy=False,
                              temperature=1) -> SimMap:
    """Cross-similarity between unshifted and rolled tilings; per-tile
    REFLECT padding (loss_util.py:615-664).  is_shift is unused — the roll
    of the second operand is unconditional, matching the reference."""
    q = _area_tokens(img, dh, dw, kernel_size, pad_mode="reflect")
    x1 = _roll(img, -shift_h, -shift_w, (2, 3))
    q1 = _area_tokens(x1, dh, dw, kernel_size, pad_mode="reflect")
    b, H, W, t, c, kk = q.shape
    q = q.reshape(b, H, W, t, c * kk)
    q1 = q1.reshape(b, H, W, t, c * kk)
    s = jnp.einsum("bhwtf,bhwuf->bhwtu", q, q1)
    s = _area_epilogue(s, dh, dw, softmax, rearrange_back, crossentropy,
                       temperature, is_shift=False, shift_h=0, shift_w=0)
    return SimMap(s=s)


def simself_gradfilter(img, is_shift=False, shift_h=4, shift_w=4, dh=32,
                       dw=32, kernel_size=5, softmax=True, rearrange_back=True,
                       crossentropy=False, temperature=1, pix_num=0.75,
                       gray=False, index=None) -> SimMap:
    """Keep the top ``pix_num`` fraction of tokens per tile by gradient-patch
    norm (descending), then mean-centered Gram (loss_util.py:664-724).
    ``index`` reuses a previous selection (the SR pass reuses GT's)."""
    if is_shift:
        img = _roll(img, -shift_h, -shift_w, (2, 3))
    if index is None:
        if gray:
            img = _gray(img)
        grad = get_gradient(img)
        qg = _area_tokens(grad, dh, dw, kernel_size, pad_mode="reflect")
        b, H, W, t, c, kk = qg.shape
        qg = qg.reshape(b, H, W, t, c * kk)
        norms = jnp.linalg.norm(qg, axis=-1)             # b,H,W,T
        # torch.sort(descending) on values; take the first pix_num*T indices
        order = jnp.argsort(-norms, axis=-1, stable=True)
        keep = int(t * pix_num)
        index = order[..., :keep]                         # b,H,W,keep
    q = _area_tokens(img, dh, dw, kernel_size, pad_mode="reflect")
    b, H, W, t, c, kk = q.shape
    q = q.reshape(b, H, W, t, c * kk)
    # torch.gather with index shape (..., keep, 1) does NOT broadcast over the
    # feature dim: the reference (loss_util.py:713) selects only feature
    # column 0, so after mean-centering q is all zeros and s degenerates to a
    # uniform softmax.  Mirrored exactly (pinned by the oracle test).
    q = jnp.take_along_axis(q[..., :1], index[..., None], axis=-2)
    q = q - jnp.mean(q, axis=-1, keepdims=True)
    s = jnp.einsum("bhwtf,bhwuf->bhwtu", q, q)
    k = s.shape[-1]
    if temperature != 0:
        s = s / temperature
    if softmax:
        s = _softmax(s)
    if crossentropy:
        s = s.reshape(b * H * W * k, k)
    return SimMap(s=s, index=index)


# ---------------------------------------------------------------------------
# masked strategies (pure-torch reference semantics)
# ---------------------------------------------------------------------------

def _gather_tiles(img: jnp.ndarray, pos: jnp.ndarray, ks: int) -> jnp.ndarray:
    """Per-center ``ks x ks`` search tiles from the reflect-padded image.
    img (c,h,w); pos (n,2) original coords -> (n, c, ks, ks)."""
    P = reflect_pad_2d(img, ks // 2)
    c = img.shape[0]
    return jax.vmap(lambda yx: lax.dynamic_slice(
        P, (0, yx[0], yx[1]), (c, ks, ks)))(pos)


def _tile_neighborhoods(tiles: jnp.ndarray, kc: int,
                        pad_mode: str = "zero") -> jnp.ndarray:
    """(n,c,ks,ks) -> (n, c*kc*kc, ks*ks) neighborhoods inside each tile.

    pad_mode 'zero' mirrors the fast reference variants (F.unfold
    padding=kc//2 — zeros beyond the tile edge, loss_util.py:752-756);
    'reflect' mirrors the _slow variant (:809-812)."""
    return _unfold(tiles, kc, padding=kc // 2, pad_mode=pad_mode)


def _rows_mask_nonlocal(img, pos, ks, kc, sigma, softmax):
    tiles = _gather_tiles(img, pos, ks)
    nb = _tile_neighborhoods(tiles, kc)                  # n, c*kc², ks²
    center = nb[:, :, (ks * ks) // 2][:, :, None]
    q = jnp.sum((nb - center) ** 2, axis=1)              # n, ks²
    q = jnp.exp(-q / sigma)
    if softmax:
        q = q / (jnp.sum(q, axis=-1, keepdims=True) + 1e-6)
    return q


def _rows_mask_nonlocal_slow(img, pos, ks, kc, sigma, softmax):
    tiles = _gather_tiles(img, pos, ks)
    n, c = tiles.shape[:2]
    padded = reflect_pad_2d(tiles, kc // 2)              # n,c,ks+2e,ks+2e
    # center neighborhood comes from the reflect-padded FULL image
    Pc = reflect_pad_2d(img, kc // 2)
    centers = jax.vmap(lambda yx: lax.dynamic_slice(
        Pc, (0, yx[0], yx[1]), (img.shape[0], kc, kc)))(pos)   # n,c,kc,kc
    cols = []
    for i in range(ks):
        for j in range(ks):
            nbr = lax.slice(padded, (0, 0, i, j), (n, c, i + kc, j + kc))
            cols.append(jnp.sum((centers - nbr) ** 2, axis=(1, 2, 3)))
    q = jnp.stack(cols, axis=1)                          # n, ks²
    q = jnp.exp(-q / sigma)
    if softmax:
        q = q / (jnp.sum(q, axis=-1, keepdims=True) + 1e-6)
    return q


def _rows_mask_trans(img, pos, ks, kc, mean, softmax, var):
    tiles = _gather_tiles(img, pos, ks)
    n, c = tiles.shape[:2]
    nb = _tile_neighborhoods(tiles, kc)                  # n, c*kc², ks²
    nb = nb.reshape(n, c, kc * kc, ks * ks)
    if mean:
        nb = nb - jnp.mean(nb, axis=-2, keepdims=True)
    if var:
        nb = nb / (jnp.var(nb, axis=-2, keepdims=True, ddof=1) + 1e-8)
    nb = nb.reshape(n, c * kc * kc, ks * ks)
    center = nb[:, :, (ks * ks) // 2]
    q = jnp.einsum("nij,ni->nj", nb, center)
    if softmax:
        q = _softmax(q)
    return q


def _drop_center_col(q, ks):
    mid = ks * ks // 2
    return jnp.concatenate([q[..., :mid], q[..., mid + 1:]], axis=-1)


# --- CUDA-op epilogues -----------------------------------------------------

def _raw_ssd(img, pos, ks, kc):
    cfg = SSGConfig(search=ks, window=kc, sigma=1.0, generalization=False)
    return ssg_ssd_maps_scan(img, cfg, pos)              # (n, ks²)


def _rows_cuda_v1(img, pos, ks, kc, sigma, softmax, avg=False, eps=1e-6):
    q = _raw_ssd(img, pos, ks, kc)
    if avg:
        q = q / (img.shape[0] * float(kc) ** 2)
    q = jnp.exp(-q / sigma)
    if softmax:
        q = q / (jnp.sum(q, axis=-1, keepdims=True) + eps)
    return q


def _rows_cuda_v2(img, pos, ks, kc, sigma, softmax):
    q = jnp.sqrt(_raw_ssd(img, pos, ks, kc) + 1e-8)
    q = jnp.exp(-q / sigma)
    if softmax:
        q = q / (jnp.sum(q, axis=-1, keepdims=True) + 1e-6)
    return q


def _rows_cuda_avg_v2(img, pos, ks, kc, sigma, softmax):
    q = _raw_ssd(img, pos, ks, kc) / (3 * float(kc) ** 2)
    q = jnp.exp(-q / sigma)
    q = _drop_center_col(q, ks)
    if softmax:
        q = q / (jnp.sum(q, axis=-1, keepdims=True) + 1e-6)
    return q


def _rows_cuda_euler(img, pos, ks, kc, sigma, softmax):
    q = _raw_ssd(img, pos, ks, kc) / (3 * float(kc) ** 2) / sigma
    q = _drop_center_col(q, ks)
    if softmax:
        q = _softmax(-q)
    return q


def _rows_cuda_avg_v3(img, pos, ks, kc, sigma, softmax):
    q = _raw_ssd(img, pos, ks, kc) / (3 * float(kc) ** 2)
    q = jnp.exp(-q / sigma)
    q = q * (jnp.sum(q, axis=-1, keepdims=True) / float(ks) ** 2)
    if softmax:
        q = q / (jnp.sum(q, axis=-1, keepdims=True) + 1e-6)
    return q


def _rows_cuda_avg_v4(img, pos, ks, kc_list, sigma, softmax):
    outs = []
    for k in kc_list:
        q = _raw_ssd(img, pos, ks, k) / (3 * float(k) ** 2)
        q = jnp.exp(-q / sigma)
        if softmax:
            q = q / (jnp.sum(q, axis=-1, keepdims=True) + 1e-10)
        outs.append(q)
    return jnp.max(jnp.stack(outs, axis=-1), axis=-1)


def _rows_cuda_v1rgb(img, mask_c, pos_per_ch, ks, kc, sigma, softmax):
    """Per-channel rows, concatenated along the row axis
    (loss_util.py:1333-1350).  pos_per_ch: list of (n_i,2) per channel."""
    outs = []
    for i in range(img.shape[0]):
        q = _raw_ssd(img[i][None], pos_per_ch[i], ks, kc) / float(kc) ** 2
        q = jnp.exp(-q / sigma)
        if softmax:
            q = q / (jnp.sum(q, axis=-1, keepdims=True) + 1e-10)
        outs.append(q)
    return jnp.concatenate(outs, axis=0)


def _rows_cuda_v5(img, pos, ks, kc, sigma, softmax, gene_type, largest_k):
    q = _raw_ssd(img, pos, ks, kc) / (img.shape[0] * float(kc) ** 2)
    q = jnp.exp(-q / sigma)
    if softmax:
        if gene_type == "sum":
            q = q / (jnp.sum(q, axis=-1, keepdims=True) + 1e-10)
        elif gene_type == "softmax":
            q = _softmax(q)
    if largest_k > 0:
        q = -jnp.sort(-q, axis=-1)[..., :largest_k]
    return q


def _rows_cuda_maxh(img_gt, img_sr, pos, ks, kc, sigma, softmax):
    c = img_gt.shape[0]
    qg = _raw_ssd(img_gt, pos, ks, kc) / (c * float(kc) ** 2)
    qs = _raw_ssd(img_sr, pos, ks, kc) / (c * float(kc) ** 2)
    max_h = (qg - qs + 1e-20) / (jnp.log((qg ** 2 + 1e-20) / (qs ** 2 + 1e-20)) + 1e-20)
    qg = jnp.exp(-qg / max_h)
    qs = jnp.exp(-qs / max_h)
    if softmax:
        qg = qg / (jnp.sum(qg, axis=-1, keepdims=True) + 1e-20)
        qs = qs / (jnp.sum(qs, axis=-1, keepdims=True) + 1e-20)
    return qg, qs


def trainable_sigma_rows(img, img_sr, pos, ks=25, kc=9, sigma=4.0,
                         softmax=False):
    """``trainable_similarity_map.forward`` (loss_util.py:1446-1478) with the
    sigma PARAMETER passed explicitly (make it a flax param / optax leaf to
    train it).  Returns (s, s1)."""
    c = img.shape[0]
    out = []
    for im in (img, img_sr):
        q = _raw_ssd(im, pos, ks, kc) / (c * float(kc) ** 2)
        q = jnp.exp(-q / jax.nn.relu(sigma) + 1e-20)
        if softmax:
            q = q / (jnp.sum(q, axis=-1, keepdims=True) + 1e-20)
        out.append(q)
    return out[0], out[1]


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_DENSE = {
    "imgimg": lambda img, kw: simself_imgimg(
        img, kw["is_shift"], kw["shift_h"], kw["shift_w"], kw["dh"], kw["dw"],
        softmax=True),
    "gradimg": lambda img, kw: simself_gradimg(
        img, kw["is_shift"], kw["shift_h"], kw["shift_w"], kw["dh"], kw["dw"],
        kw["gray"], kw["threshold"]),
    "gradgrad": lambda img, kw: simself_gradgrad(
        img, kw["is_shift"], kw["shift_h"], kw["shift_w"], kw["dh"], kw["dw"],
        kw["gray"], kw["threshold"]),
    "areaarea": lambda img, kw: simself_areaarea(
        img, kw["is_shift"], kw["shift_h"], kw["shift_w"], kw["dh"], kw["dw"],
        kw["kernel_size"], kw["softmax"], kw["rearrange_back"],
        kw["crossentropy"], kw["temperature"], kw["mean"]),
    "areaarea_ori": lambda img, kw: simself_areaarea_ori(
        img, kw["is_shift"], kw["shift_h"], kw["shift_w"], kw["dh"], kw["dw"],
        kw["kernel_size"], kw["mean"]),
    "areaarea_nonlocal": lambda img, kw: simself_areaarea_nonlocal(
        img, kw["is_shift"], kw["shift_h"], kw["shift_w"], kw["dh"], kw["dw"],
        kw["kernel_size"], kw["scaling_factor"]),
    "areaarea_nonlocal_slow": lambda img, kw: simself_areaarea_nonlocal_slow(
        img, kw["is_shift"], kw["shift_h"], kw["shift_w"], kw["dh"], kw["dw"],
        kw["kernel_size"], kw["scaling_factor"]),
    "areaarea_cos": lambda img, kw: simself_areaarea_cos(
        img, kw["is_shift"], kw["shift_h"], kw["shift_w"], kw["dh"], kw["dw"],
        kw["kernel_size"], kw["softmax"], kw["rearrange_back"],
        kw["crossentropy"], kw["temperature"]),
    "areaarea_stride": lambda img, kw: simself_areaarea_stride(
        img, kw["is_shift"], kw["shift_h"], kw["shift_w"], kw["dh"], kw["dw"],
        kw["kernel_size"], kw["softmax"], kw["rearrange_back"],
        kw["crossentropy"], kw["temperature"], kw["stride"]),
    "areaarea_pad_roll": lambda img, kw: simself_areaarea_pad_roll(
        img, kw["is_shift"], kw["shift_h"], kw["shift_w"], kw["dh"], kw["dw"],
        kw["kernel_size"], kw["softmax"], kw["rearrange_back"],
        kw["crossentropy"], kw["temperature"]),
    # the reference dispatch hardcodes is_shift=False, shift 4,4 here (:303)
    "areaarea_gradfilter": lambda img, kw: simself_gradfilter(
        img, False, 4, 4, kw["dh"], kw["dw"], kw["kernel_size"],
        kw["softmax"], kw["rearrange_back"], kw["crossentropy"],
        kw["temperature"], kw["pix_num"], kw["gray"], kw["index"]),
}

# masked families: row function given (img_chw, pos) -> (n, cols)
_MASKED = {
    "areaarea_mask_nonlocal": lambda im, pos, kw: _rows_mask_nonlocal(
        im, pos, kw["kernel_size"], kw["kernel_size_center"],
        kw["scaling_factor"], kw["softmax"]),
    "areaarea_mask_nonlocal_slow": lambda im, pos, kw: _rows_mask_nonlocal_slow(
        im, pos, kw["kernel_size"], kw["kernel_size_center"],
        kw["scaling_factor"], kw["softmax"]),
    "areaarea_mask_trans": lambda im, pos, kw: _rows_mask_trans(
        im, pos, kw["kernel_size"], kw["kernel_size_center"],
        kw["mean"], kw["softmax"], kw["var"]),
    "areaarea_mask_nonlocal_cuda_v1": lambda im, pos, kw: _rows_cuda_v1(
        im, pos, kw["kernel_size"], kw["kernel_size_center"],
        kw["scaling_factor"], kw["softmax"]),
    "areaarea_mask_nonlocal_cuda_v2": lambda im, pos, kw: _rows_cuda_v2(
        im, pos, kw["kernel_size"], kw["kernel_size_center"],
        kw["scaling_factor"], kw["softmax"]),
    "areaarea_mask_nonlocalavg_cuda_v1": lambda im, pos, kw: _rows_cuda_v1(
        im, pos, kw["kernel_size"], kw["kernel_size_center"],
        kw["scaling_factor"], kw["softmax"], avg=True, eps=1e-20),
    "areaarea_mask_nonlocalavg_cuda_v2": lambda im, pos, kw: _rows_cuda_avg_v2(
        im, pos, kw["kernel_size"], kw["kernel_size_center"],
        kw["scaling_factor"], kw["softmax"]),
    "areaarea_mask_eulardistanceavg_cuda_v1": lambda im, pos, kw: _rows_cuda_euler(
        im, pos, kw["kernel_size"], kw["kernel_size_center"],
        kw["scaling_factor"], kw["softmax"]),
    "areaarea_mask_nonlocalavg_cuda_v3": lambda im, pos, kw: _rows_cuda_avg_v3(
        im, pos, kw["kernel_size"], kw["kernel_size_center"],
        kw["scaling_factor"], kw["softmax"]),
    "areaarea_mask_nonlocalavg_cuda_v4": lambda im, pos, kw: _rows_cuda_avg_v4(
        im, pos, kw["kernel_size"],
        kw["kernel_size_center"] if isinstance(kw["kernel_size_center"], (list, tuple))
        else [5, 9, 13], kw["scaling_factor"], kw["softmax"]),
    "areaarea_mask_nonlocalavg_cuda_v5": lambda im, pos, kw: _rows_cuda_v5(
        im, pos, kw["kernel_size"], kw["kernel_size_center"],
        kw["scaling_factor"], kw["softmax"], kw["gene_type"], kw["largest_k"]),
}

# per-(dh,dw)-patch masked families: row fn applied inside each grid patch
_PATCHED = {
    "areaarea_mask_nonlocal_patch": "areaarea_mask_nonlocal",
    "areaarea_mask_trans_patch": "areaarea_mask_trans",
    "areaarea_mask_nonlocal_cuda_v1_patch": "areaarea_mask_nonlocal_cuda_v1",
}

_DEFAULTS = dict(is_shift=False, shift_h=16, shift_w=16, dh=32, dw=32,
                 gray=False, threshold=2e-3, kernel_size=5, scaling_factor=4,
                 softmax=True, rearrange_back=True, crossentropy=False,
                 temperature=0, stride=1, pix_num=1, index=None,
                 kernel_size_center=9, mean=False, var=False, largest_k=0,
                 gene_type="sum")


def similarity_map(img, mask=None, img_sr=None,
                   simself_strategy="imgimg", capacity=None, **kwargs) -> SimMap:
    """Reference-dispatch-equivalent entry (loss_util.py:245-363).

    img: (b,c,h,w).  Masked strategies follow the reference's contract of
    b==1.  ``capacity``: None = size positions from the concrete mask (eager
    only, exact reference shapes incl. skip-empty patches); an int = fixed
    jit-friendly capacity — rows beyond the true count are garbage, use the
    returned ``valid``.
    """
    kw = dict(_DEFAULTS)
    kw.update(kwargs)
    strat = simself_strategy

    if strat in _DENSE:
        return _DENSE[strat](img, kw)

    if strat == "areaarea_mask_nonlocalavg_cuda_v1_p":
        raise NotImplementedError(
            "dead in the reference: simself_mask_nonlocalavg_cuda_v1_p is "
            "commented out (loss_util.py:1401), selecting it raises "
            "AttributeError there too")

    if strat == "areaarea_mask_nonlocalavg_cuda_v1RGB":
        assert img.shape[0] == 1, "masked strategies are per-image (b==1)"
        c = img.shape[1]
        mc = mask[0] if mask.shape[1] == c else jnp.repeat(mask[0], c, axis=0)
        pos_per_ch, valids = [], []
        for i in range(c):
            p, v, _ = _positions(mc[i], capacity)
            pos_per_ch.append(p)
            valids.append(v)
        s = _rows_cuda_v1rgb(img[0], mc, pos_per_ch, kw["kernel_size"],
                             kw["kernel_size_center"], kw["scaling_factor"],
                             kw["softmax"])
        return SimMap(s=s[None], valid=jnp.concatenate(valids))

    if strat == "areaarea_mask_nonlocalavg_cuda_maxh_v1":
        assert img.shape[0] == 1 and img_sr is not None
        pos, valid, _ = _positions(mask[0, 0], capacity)
        qg, qs = _rows_cuda_maxh(img[0], img_sr[0], pos, kw["kernel_size"],
                                 kw["kernel_size_center"],
                                 kw["scaling_factor"], kw["softmax"])
        return SimMap(s=qg[None], s1=qs[None], valid=valid)

    if strat == "areaarea_mask_nonlocal_patch_mutual":
        return _mutual_patch(img, img_sr, mask, kw, capacity)

    if strat in _PATCHED:
        return _patched(strat, img, mask, kw, capacity)

    if strat in _MASKED:
        assert img.shape[0] == 1, "masked strategies are per-image (b==1)"
        pos, valid, _ = _positions(mask[0, 0], capacity)
        s = _MASKED[strat](img[0], pos, kw)
        return SimMap(s=s[None], valid=valid)

    raise ValueError(f"unknown simself_strategy: {strat!r}")


def _positions(mask2d, capacity):
    if capacity is None:
        ys, xs = jnp.nonzero(mask2d == 1)               # eager: concrete size
        pos = jnp.stack([ys, xs], axis=-1).astype(jnp.int32)
        return pos, jnp.ones(pos.shape[0], bool), pos.shape[0]
    return mask_to_positions(mask2d, capacity)


def _patched(strat, img, mask, kw, capacity):
    """Per-(dh,dw)-grid-patch masked rows; empty patches are skipped in eager
    mode (exact reference concat) and zero-weighted in capacity mode."""
    assert img.shape[0] == 1
    base = _PATCHED[strat]
    dh, dw = kw["dh"], kw["dw"]
    tiles = _tile_grid(img, dh, dw)[0]                   # (P, c, dh, dw)
    mtiles = _tile_grid(mask, dh, dw)[0]                 # (P, c1, dh, dw)
    rows, valids = [], []
    per_patch_cap = None if capacity is None else capacity
    for i in range(tiles.shape[0]):
        m2d = mtiles[i, 0]
        if capacity is None and int(jnp.sum(m2d)) == 0:
            continue                                     # reference skip
        pos, valid, _ = _positions(m2d, per_patch_cap)
        if base == "areaarea_mask_trans":
            # the _patch variant drops the center column BEFORE softmax
            # (loss_util.py:1040-1049), unlike plain mask_trans
            q = _drop_center_col(
                _rows_mask_trans_nosoftmax(tiles[i], pos, kw),
                kw["kernel_size"])
            if kw["softmax"]:
                q = _softmax(q)
        else:
            q = _MASKED[base](tiles[i], pos, kw)
        rows.append(q)
        valids.append(valid)
    s = jnp.concatenate(rows, axis=0)
    return SimMap(s=s[None], valid=jnp.concatenate(valids))


def _rows_mask_trans_nosoftmax(im, pos, kw):
    return _rows_mask_trans(im, pos, kw["kernel_size"],
                            kw["kernel_size_center"], kw["mean"],
                            softmax=False, var=kw["var"])


def _mutual_patch(img_gt, img_sr, mask, kw, capacity):
    """GT rows per patch + SR rows measured against the GT center patch
    (loss_util.py:1059-1178: ``q = sr_search - GT_center``)."""
    assert img_gt.shape[0] == 1 and img_sr is not None
    ks, kc = kw["kernel_size"], kw["kernel_size_center"]
    sigma, softmax = kw["scaling_factor"], kw["softmax"]
    dh, dw = kw["dh"], kw["dw"]
    gt_tiles = _tile_grid(img_gt, dh, dw)[0]
    sr_tiles = _tile_grid(img_sr, dh, dw)[0]
    mtiles = _tile_grid(mask, dh, dw)[0]
    rows_gt, rows_sr, valids = [], [], []
    for i in range(gt_tiles.shape[0]):
        m2d = mtiles[i, 0]
        if capacity is None and int(jnp.sum(m2d)) == 0:
            continue
        pos, valid, _ = _positions(m2d, capacity)
        nb_gt = _tile_neighborhoods(_gather_tiles(gt_tiles[i], pos, ks), kc)
        center = nb_gt[:, :, (ks * ks) // 2][:, :, None]
        for nb, sink in ((nb_gt, rows_gt), (None, rows_sr)):
            if nb is None:
                nb = _tile_neighborhoods(_gather_tiles(sr_tiles[i], pos, ks), kc)
            q = jnp.sum((nb - center) ** 2, axis=1)
            q = jnp.exp(-q / sigma)
            if softmax:
                q = q / (jnp.sum(q, axis=-1, keepdims=True) + 1e-6)
            sink.append(q)
        valids.append(valid)
    return SimMap(s=jnp.concatenate(rows_gt, axis=0)[None],
                  s1=jnp.concatenate(rows_sr, axis=0)[None],
                  valid=jnp.concatenate(valids))


# ---------------------------------------------------------------------------
# issl-equivalent loss over any strategy
# ---------------------------------------------------------------------------

def simself_strategy_loss(sr, gt, mask, setting):
    """(l_selfsim, l_selfsim_kl) through an arbitrary ``simself_strategy`` —
    the reference's ``issl`` composition (ddpmssl.py:439-513): per-image
    similarity maps of SR (``softmax_sr``) and GT (``softmax_gt``),
    concatenated, then L1-mean + KL.  jit-compatible: images whose (strided)
    mask is empty are zero-weighted instead of skipped, and masked-family rows
    use the fixed ``setting.capacity`` with validity weighting — the loss
    VALUE equals the reference's skip-and-concat whenever capacity covers
    every image's edge count.

    sr, gt: NHWC in [0,1]; mask: (b,h,w) or (b,h,w,1).
    """
    from ssl_tpu.losses.basic_loss import KLDistanceLoss
    from ssl_tpu.ops.ssg import apply_mask_stride

    opts = dict(setting.strategy_opts)
    strat = setting.strategy
    kw = dict(
        dh=int(opts.get("simself_dh", 16)), dw=int(opts.get("simself_dw", 16)),
        kernel_size=int(opts.get("kernel_size", 25)),
        scaling_factor=opts.get("scaling_factor", 4),
        temperature=opts.get("temperature", 0),
        crossentropy=bool(opts.get("crossentropy", False)),
        rearrange_back=bool(opts.get("rearrange_back", True)),
        kernel_size_center=opts.get("kernel_size_center", 9),
        mean=bool(opts.get("mean", False)), var=bool(opts.get("var", False)),
        gene_type=opts.get("gene_type", "sum"),
        largest_k=int(opts.get("largest_k", 0)),
        stride=1, pix_num=1, index=None)
    softmax_sr = bool(opts.get("softmax_sr", False))
    softmax_gt = bool(opts.get("softmax_gt", False))

    if mask.ndim == 4:
        mask = mask[..., 0]
    mask = apply_mask_stride(mask, setting.mask_stride)
    sr_n = sr.transpose(0, 3, 1, 2)
    gt_n = gt.transpose(0, 3, 1, 2)
    b = sr_n.shape[0]

    kl = KLDistanceLoss(loss_weight=1.0, softmax=setting.kl_softmax)
    l1_num = kl_num = denom = 0.0
    for i in range(b):
        m_i = mask[i][None, None]
        img_w = (jnp.sum(m_i) > 0).astype(jnp.float32)   # reference skip
        out = similarity_map(sr_n[i][None], mask=m_i, simself_strategy=strat,
                             capacity=setting.capacity, softmax=softmax_sr, **kw)
        tgt = similarity_map(gt_n[i][None], mask=m_i, simself_strategy=strat,
                             capacity=setting.capacity, softmax=softmax_gt, **kw)
        tgt_s = lax.stop_gradient(tgt.s)
        if out.valid is not None:
            w = out.valid.astype(jnp.float32)[None, :, None] * img_w
        else:
            w = jnp.full(out.s.shape[:1] + (1,) * (out.s.ndim - 1), img_w)
        l1_num = l1_num + jnp.sum(jnp.abs(out.s - tgt_s) * w)
        kl_num = kl_num + jnp.sum(kl.pointwise(out.s, tgt_s) * w)
        denom = denom + jnp.sum(w * jnp.ones_like(out.s))
    denom = denom + 1e-12
    return (setting.l1_weight * l1_num / denom,
            setting.kl_weight * kl_num / denom)


def judge_abnormal_pixel(sr, gt, kernel_size=3):
    """loss_util.py:1483-1519: pixels whose center |SR-GT| exceeds 3x the
    neighborhood-average difference.  Returns (sr_abnormal, gt_abnormal,
    normal_mask, abnormal_mask) — boolean masks (b,c,h,w) instead of torch
    index tuples (jit-friendly; apply with jnp.where)."""
    b, c, h, w = sr.shape
    k = kernel_size
    su = _unfold(sr, k, padding=k // 2, pad_mode="reflect").reshape(b, c, k * k, h * w)
    gu = _unfold(gt, k, padding=k // 2, pad_mode="reflect").reshape(b, c, k * k, h * w)
    mid = k * k // 2
    d_center = jnp.abs(su[:, :, mid] - gu[:, :, mid]).sum(axis=1, keepdims=True)
    d_nbr = (jnp.abs(su - gu).sum(axis=2) - jnp.abs(su[:, :, mid] - gu[:, :, mid])
             ).sum(axis=1, keepdims=True) / (k * k - 1)
    abnormal = (d_center > 3 * d_nbr).reshape(b, 1, h, w)
    abnormal = jnp.repeat(abnormal, c, axis=1)
    return sr[abnormal], gt[abnormal], ~abnormal, abnormal
