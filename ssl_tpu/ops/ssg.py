"""Self-Similarity Graph (SSG) — the scientific core of SSL, TPU-native.

Semantics (matching the reference CUDA op, the one every shipped config uses:
``GAN-Based-SR/basicsr/losses/similarity/similarity.cu:5-54`` and its epilogue
``GAN-Based-SR/basicsr/losses/loss_util.py:231-244``):

For an image ``img`` (c,h,w) and a binary edge mask (h,w), reflect-pad the image
by ``search//2``.  For every edge pixel ``(y,x)`` and every search offset
``(dy,dx) in [-p,p]^2`` (p = search//2), accumulate a windowed SSD over window
offsets ``(kh,kw) in [-k,k]^2`` (k = window//2):

    inside  = (dy+kh in [-p,p]) and (dx+kw in [-p,p])
    term    = (P[c,y+p+kh,x+p+kw] - P[c,y+p+dy+kh,x+p+dx+kw])^2   if inside
            = (P[c,y+p+kh,x+p+kw])^2                               otherwise

    ssd[y,x,dy,dx] = sum_c sum_k term

(The "otherwise" branch treats candidate-window pixels that fall outside the
25x25 search patch as zeros — identical maths in the reference CUDA and
pytorch paths.)  Epilogue: ``q = exp(-(ssd/(c*window^2))/sigma)`` and, with
``generalization=True``, each 625-row is normalized to sum 1 (+1e-10).

TPU-native design — NOT a port of the CUDA one-thread-per-(pixel,offset) loop:
the per-edge-pixel gather is re-expressed as **dense shifted-difference maps
with rectangular box-sums as banded-matrix MATMULS on the MXU**, scanned over
the 625 search offsets.  The training loss (``ssl_loss_dense_batched``) is
loss-fused and exact for any edge-pixel count, with an ANALYTIC custom VJP
(band-adjoint matmuls + shift scatter — no atomics; the reference backward
needed ``atomicAdd``, ``similarity.cu:124-128``).  A gather-based path
(``ssg_matrix``) keeps the reference's (N, 625) SSG-matrix API for parity.

Full derivation and compiler notes: docs/DESIGN_SSG.md.  A fused Pallas kernel
with the same contract lives in ``ssg_pallas.py``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class SSGConfig(NamedTuple):
    """Hyper-parameters of the SSG (defaults = every shipped reference config,
    ``options/train/ESRGANSSL/train_ESRGANSSL_bicubic_x4.yml:70-76``)."""

    search: int = 25          # kernel_size_search
    window: int = 9           # kernel_size_window
    sigma: float = 0.004      # scaling factor in exp(-q/sigma)
    generalization: bool = True  # row-normalize each 625-vector
    # Storage dtype of the stored-q fast path's HBM stack ('float32' |
    # 'bfloat16').  bf16 halves the dominant HBM traffic of the SSL term;
    # normalization denominators stay fp32-exact (accumulated pre-cast) and
    # all arithmetic upcasts on read, so only the q values themselves carry
    # the bf16 rounding (~2^-9 relative) — of the same order as the bf16 MXU
    # matmuls already used for the smap in production.  Deviation is pinned
    # by tests/test_ssg.py::test_stored_bf16_deviation.
    q_store_dtype: str = "float32"
    # Streaming dtype of the padded-image slices inside the offset sweeps
    # ('float32' | 'bfloat16').  The 625-offset scan re-reads a shifted slice
    # of the padded image every iteration — at the shipped config that is
    # ~11 GB of fwd HBM traffic, the single largest stream of the SSL term.
    # bf16 halves it.  Precision: the box-sum matmuls already round their
    # operands to bf16 on the MXU (jax_default_matmul_precision=bfloat16 in
    # production), so rounding P itself adds one more half-ulp of the same
    # order; squared-difference accumulation over channels stays fp32.
    # Pinned by tests/test_ssg.py::test_stream_bf16_deviation.
    stream_dtype: str = "float32"
    # Offset pairing in the stored-q fast path: the raw SSD map of offset -d
    # is a pure shift of offset +d's (D_{-d}(u,v) = D_d(u-dy, v-dx)), and a
    # shift of a banded box-sum is the same box-sum under offset band bounds
    # (DESIGN_SSG §9) — so the forward computes ONE squared-difference map
    # per (+d, -d) pair, and the backward streams each Pbig slice pair once
    # per pair instead of twice (P_pd(-d) = P_md(+d)).  Exact, no
    # approximation; knob kept for on-chip A/B.
    pair_offsets: bool = True


def reflect_pad_2d(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad the trailing two dims (PyTorch 'reflect': edge not repeated)."""
    widths = [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(img, widths, mode="reflect")


def mask_to_positions(mask: jnp.ndarray, capacity: int):
    """Binary (h,w) mask -> fixed-capacity row-major positions.

    Returns (pos, valid, count): pos (capacity,2) int32 (y,x) with padding rows
    (0,0); valid (capacity,) bool; count () int32 = true number of edge pixels
    (may exceed capacity — callers should treat rows >= capacity as truncated).
    Row-major order matches ``torch.nonzero`` in the reference wrapper
    (``similaritywrapper.py:67``).
    """
    flat = (mask.reshape(-1) == 1)
    count = jnp.sum(flat, dtype=jnp.int32)
    idx = jnp.nonzero(flat, size=capacity, fill_value=mask.size)[0]
    valid = idx < mask.size
    idx = jnp.where(valid, idx, 0)
    w = mask.shape[-1]
    pos = jnp.stack([idx // w, idx % w], axis=-1).astype(jnp.int32)
    return pos, valid, count


def apply_mask_stride(mask: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Diagonal-lattice subsampling of an edge mask.

    Multiplies the mask by a tiled ``eye(stride)`` pattern, keeping ~1/stride of
    the edge pixels (reference: ``esrganssl_model.py:56-63``).  ``stride<=1`` is
    the identity.
    """
    if stride <= 1:
        return mask
    h, w = mask.shape[-2], mask.shape[-1]
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lattice = ((yy % stride) == (xx % stride)).astype(mask.dtype)
    return mask * lattice


def _prefix_rows(m: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix-sum along axis 0, shape (H+1, W)."""
    return jnp.pad(jnp.cumsum(m, axis=0), ((1, 0), (0, 0)))


def _rect_rows(prefix: jnp.ndarray, lo, hi, p: int, out_h: int) -> jnp.ndarray:
    """sum_{u=y+p+lo}^{y+p+hi} m[u] for y in [0,out_h) given exclusive prefix."""
    wp = prefix.shape[1]
    top = lax.dynamic_slice(prefix, (p + lo, 0), (out_h, wp))
    bot = lax.dynamic_slice(prefix, (p + hi + 1, 0), (out_h, wp))
    return bot - top


def _rect_cols(rows: jnp.ndarray, lo, hi, p: int, out_w: int) -> jnp.ndarray:
    h = rows.shape[0]
    prefix = jnp.pad(jnp.cumsum(rows, axis=1), ((0, 0), (1, 0)))
    left = lax.dynamic_slice(prefix, (0, p + lo), (h, out_w))
    right = lax.dynamic_slice(prefix, (0, p + hi + 1), (h, out_w))
    return right - left


def ssg_ssd_maps_scan(img: jnp.ndarray, cfg: SSGConfig, pos: jnp.ndarray):
    """Core: gathered raw SSD values for each (edge pixel, search offset).

    img: (c,h,w) float32.  pos: (cap,2) int32 original-image coords.
    Returns (cap, search*search) float32 raw SSDs (before /c*window^2, exp).
    """
    search, window = cfg.search, cfg.window
    p, k = search // 2, window // 2
    c, h, w = img.shape

    P = reflect_pad_2d(img, p)                       # (c, h+2p, w+2p)
    hp, wp = h + 2 * p, w + 2 * p
    # Extra zero pad so candidate shifts are plain dynamic slices.
    Pbig = jnp.pad(P, ((0, 0), (p, p), (p, p)))       # (c, h+4p, w+4p)

    center2 = jnp.sum(P * P, axis=0)                  # (hp, wp)
    c2_rows_prefix = _prefix_rows(center2)            # (hp+1, wp)
    # Full window x window box of center^2 at each center (static bounds).
    full_rows = c2_rows_prefix[p + k + 1:p + k + 1 + h] - c2_rows_prefix[p - k:p - k + h]
    box_c2 = _rect_cols(full_rows, -k, k, p, w)       # (h, w)

    flat_pos = pos[:, 0] * w + pos[:, 1]              # (cap,)

    def body(_, s):
        dy = s // search - p
        dx = s % search - p
        # Candidate image shifted by (dy,dx).
        Pshift = lax.dynamic_slice(Pbig, (0, p + dy, p + dx), (c, hp, wp))
        D = jnp.sum((P - Pshift) ** 2, axis=0)        # (hp, wp)
        # Valid window-offset rectangle for this search offset.
        a_y = jnp.maximum(-k, -p - dy)
        b_y = jnp.minimum(k, p - dy)
        a_x = jnp.maximum(-k, -p - dx)
        b_x = jnp.minimum(k, p - dx)
        rect_d = _rect_cols(_rect_rows(_prefix_rows(D), a_y, b_y, p, h), a_x, b_x, p, w)
        rect_c = _rect_cols(_rect_rows(c2_rows_prefix, a_y, b_y, p, h), a_x, b_x, p, w)
        smap = rect_d + (box_c2 - rect_c)             # (h, w)
        return None, jnp.take(smap.reshape(-1), flat_pos)

    _, out = lax.scan(jax.checkpoint(body), None, jnp.arange(search * search))
    return out.T                                      # (cap, search^2)


def ssg_epilogue(ssd: jnp.ndarray, num_ch: int, cfg: SSGConfig) -> jnp.ndarray:
    """ssd (..., search^2) raw -> normalized similarity rows q."""
    q = ssd / (num_ch * float(cfg.window) ** 2)
    q = jnp.exp(-q / cfg.sigma)
    if cfg.generalization:
        q = q / (jnp.sum(q, axis=-1, keepdims=True) + 1e-10)
    return q


def ssg_matrix(img: jnp.ndarray, pos: jnp.ndarray, cfg: SSGConfig = SSGConfig(),
               impl: str = "scan") -> jnp.ndarray:
    """Full SSG rows for given edge positions. img (c,h,w); pos (cap,2).

    Returns (cap, search^2); rows for padding positions are well-defined (they
    are the SSG of pixel (0,0)) — mask them with the validity mask.
    `impl`: 'scan' (pure jnp) or 'pallas' (fused TPU kernel).
    """
    if impl == "pallas":
        from ssl_tpu.ops.ssg_pallas import ssg_ssd_maps_pallas
        ssd = ssg_ssd_maps_pallas(img, cfg, pos)
    else:
        ssd = ssg_ssd_maps_scan(img, cfg, pos)
    return ssg_epilogue(ssd, img.shape[0], cfg)


def ssg_from_mask(img: jnp.ndarray, mask: jnp.ndarray, capacity: int,
                  cfg: SSGConfig = SSGConfig(), impl: str = "scan"):
    """Convenience: (q, valid, count) from a binary mask."""
    pos, valid, count = mask_to_positions(mask, capacity)
    q = ssg_matrix(img, pos, cfg, impl=impl)
    return q, valid, count


# ---------------------------------------------------------------------------
# Masked-dense fused SSL loss — no gather, no capacity truncation
# ---------------------------------------------------------------------------
# NOTE on batching: everything here is written NATIVELY BATCHED (leading batch
# axis) instead of vmapped.  Under vmap, dynamic_slice with a traced-but-
# batch-uniform start lowers to lax.gather, which the TPU Mosaic compiler
# unrolls per batch element — compile time then scales linearly with batch
# (measured: 106s at b=2 vs 876s at b=16).  Native batching keeps the slice a
# single dynamic_slice and compiles like b=1.

import os as _os
# Unroll factor for the search-offset scans: amortizes per-iteration loop
# overhead on TPU (625 tiny steps otherwise); tunable via SSG_SCAN_UNROLL.
_SCAN_UNROLL = int(_os.environ.get("SSG_SCAN_UNROLL", "5"))


def _prefix_rows_b(m: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix-sum along axis -2: (..., H, W) -> (..., H+1, W)."""
    pad = [(0, 0)] * (m.ndim - 2) + [(1, 0), (0, 0)]
    return jnp.pad(jnp.cumsum(m, axis=-2), pad)


def _rect_rows_b(prefix: jnp.ndarray, lo, hi, p: int, out_h: int) -> jnp.ndarray:
    """Batched row rect-sum: prefix (b, H+1, W) -> (b, out_h, W)."""
    b, _, wp = prefix.shape
    top = lax.dynamic_slice(prefix, (0, p + lo, 0), (b, out_h, wp))
    bot = lax.dynamic_slice(prefix, (0, p + hi + 1, 0), (b, out_h, wp))
    return bot - top


def _rect_cols_b(rows: jnp.ndarray, lo, hi, p: int, out_w: int) -> jnp.ndarray:
    b, h, _ = rows.shape
    prefix = jnp.pad(jnp.cumsum(rows, axis=-1), [(0, 0), (0, 0), (1, 0)])
    left = lax.dynamic_slice(prefix, (0, 0, p + lo), (b, h, out_w))
    right = lax.dynamic_slice(prefix, (0, 0, p + hi + 1), (b, h, out_w))
    return right - left


def _dense_context_b(img: jnp.ndarray, cfg: SSGConfig):
    """Batched context. img: (b, c, h, w).

    P/Pbig are stored in cfg.stream_dtype: the offset sweeps re-stream them
    625 times, so this dtype sets the dominant HBM traffic of the SSL term.
    center2/box_c2 are computed fp32 BEFORE the cast (exact box sums)."""
    search, window = cfg.search, cfg.window
    p, k = search // 2, window // 2
    b, c, h, w = img.shape
    P = reflect_pad_2d(img, p)                            # (b, c, hp, wp)
    center2 = jnp.sum(P * P, axis=1)                      # (b, hp, wp)
    # full window x window box of center^2 (static band matmuls)
    By = _band_matrix(h, h + 2 * p, p, -k, k)
    Bx = _band_matrix(w, w + 2 * p, p, -k, k)
    rows = jnp.einsum("yu,buv->byv", By, center2, preferred_element_type=jnp.float32)
    box_c2 = jnp.einsum("byv,xv->byx", rows, Bx, preferred_element_type=jnp.float32)
    P = P.astype(cfg.stream_dtype)
    Pbig = jnp.pad(P, ((0, 0), (0, 0), (p, p), (p, p)))
    return P, Pbig, center2, box_c2


def _band_matrix(n_out: int, n_in: int, p: int, lo, hi) -> jnp.ndarray:
    """0/1 band matrix B[y,u] = 1 iff lo <= u - (y+p) <= hi.

    Left/right-multiplying by these performs the rectangular box-sum as a
    small MATMUL — the box-filter rides the MXU instead of prefix-sum chains
    on the VPU (the TPU-native formulation of the windowed SSD)."""
    yy = lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0)
    uu = lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    d = uu - yy - p
    return jnp.logical_and(d >= lo, d <= hi).astype(jnp.float32)


def _dense_smap_b(ctx, s, cfg: SSGConfig, h: int, w: int):
    """Batched dense raw-SSD map (b, h, w) for search-offset index s.

    Box-sums are banded matmuls: S = B_y @ M @ B_x^T with bands set by the
    (traced) valid window rectangle of this shift."""
    search, window = cfg.search, cfg.window
    p, k = search // 2, window // 2
    P, Pbig, center2, box_c2 = ctx
    b, c, hp, wp = P.shape
    dy = s // search - p
    dx = s % search - p
    Pshift = lax.dynamic_slice(Pbig, (0, 0, p + dy, p + dx), (b, c, hp, wp))
    D = jnp.sum((P - Pshift) ** 2, axis=1, dtype=jnp.float32)  # (b, hp, wp)
    a_y = jnp.maximum(-k, -p - dy)
    b_y = jnp.minimum(k, p - dy)
    a_x = jnp.maximum(-k, -p - dx)
    b_x = jnp.minimum(k, p - dx)
    By = _band_matrix(h, hp, p, a_y, b_y)                 # (h, hp)
    Bx = _band_matrix(w, wp, p, a_x, b_x)                 # (w, wp)
    DmC = D - center2                                     # fold the C-rect in
    rows = jnp.einsum("yu,buv->byv", By, DmC, preferred_element_type=jnp.float32)
    rect = jnp.einsum("byv,xv->byx", rows, Bx, preferred_element_type=jnp.float32)
    return rect + box_c2


def _band_T(n_out: int, n_in: int, p: int, lo, hi) -> jnp.ndarray:
    """Transpose band (n_in, n_out) for the adjoint box-sums."""
    return _band_matrix(n_out, n_in, p, lo, hi).T


def _shift_bounds(s: jnp.ndarray, cfg: SSGConfig):
    p, k = cfg.search // 2, cfg.window // 2
    dy = s // cfg.search - p
    dx = s % cfg.search - p
    return (dy, dx,
            jnp.maximum(-k, -p - dy), jnp.minimum(k, p - dy),
            jnp.maximum(-k, -p - dx), jnp.minimum(k, p - dx))


def ssl_loss_dense_bwd(sr, gt, mask, inv_sr, inv_gt, g_l1, g_kl,
                       cfg: SSGConfig = SSGConfig(), a_map=None, b_map=None):
    """Analytic gradient of (g_l1*l1_sum + g_kl*kl_sum) w.r.t. sr.

    Derivation (x = q_sr*inv_sr, y = q_gt*inv_gt, R-normalization folded in):
      dL/dx_d   = mask * (g_l1*sign(x-y) - g_kl*y/x)          =: g_d
      dL/dq_d   = inv*g_d - inv^2 * T,  T = sum_d g_d q_d
      dL/dS_d   = dL/dq_d * q_d * (-1/(norm*sigma))           =: G_d
      dS_d/dP: rect-adjoint band matmuls A_d = By^T G_d Bx, then
      dP += 2[A_d*(P - P_d) - shift_d(A_d*(P - P_d))] per d, and the
      C-terms batched once at the end: dP += 2P*(box9^T(sum G) - sum A).
    Finally the reflect-pad adjoint folds dP back to the image.

    One pass over the 625 offsets (vs autodiff's remat double-recompute)."""
    b, c, h, w = sr.shape
    search = cfg.search
    p, k = search // 2, cfg.window // 2
    n2 = search * search
    norm = c * float(cfg.window) ** 2
    scale = -1.0 / (norm * cfg.sigma)
    ctx = _dense_context_b(jnp.concatenate([sr, jax.lax.stop_gradient(gt)], axis=0), cfg)
    P, Pbig = ctx[0][:b], ctx[1][:b]
    hp, wp = P.shape[2], P.shape[3]
    mask = mask.astype(sr.dtype)

    def q_maps(s):
        q = jnp.exp(-(_dense_smap_b(ctx, s, cfg, h, w) / norm) / cfg.sigma)
        return q[:b], q[b:]

    def g_of(q_sr, q_gt):
        x = q_sr * inv_sr
        y = q_gt * inv_gt
        sign = jnp.sign(x - y)
        kl_term = jnp.where(x > 1e-10, -y / jnp.clip(x, min=1e-10), 0.0)
        return mask * (g_l1 * sign + g_kl * kl_term)

    # T = sum_d g_d q_d (the row-normalization coupling term; zero when
    # generalization is off since R then doesn't depend on q).  With q_d =
    # x_d / inv, T factors through the forward-accumulated maps:
    #   T = (1/inv) * mask * (g_l1 * A - g_kl * B),
    # A = sum_d sign(x-y) x, B = sum_d y [x>eps] — no extra offset pass.
    if not cfg.generalization:
        T = jnp.zeros((b, h, w))
    elif a_map is not None:
        T = (1.0 / inv_sr) * mask * (g_l1 * a_map - g_kl * b_map)
    else:
        def passA(carry, s):
            q_sr, q_gt = q_maps(s)
            return carry + g_of(q_sr, q_gt) * q_sr, None

        T, _ = lax.scan(jax.checkpoint(passA), jnp.zeros((b, h, w)), jnp.arange(n2),
                        unroll=_SCAN_UNROLL)

    # pass B, FACTORED form (same identities as _ssl_dense_bwd_stored):
    # shift_d(A_d*(P - P_d)) = shiftA_d*(P_{-d} - P), with shiftA_d itself a
    # band-matmul product under offset bounds — no per-offset canvas, no
    # (b,c,·,·) shifted tensor.
    def passB(carry, s):
        acc1, sumShiftA, sumG = carry
        dy, dx, a_y, b_y, a_x, b_x = _shift_bounds(s, cfg)
        q_sr, q_gt = q_maps(s)
        g_d = g_of(q_sr, q_gt)
        G_d = (inv_sr * g_d - inv_sr * inv_sr * T) * q_sr * scale   # (b,h,w)
        ByT = _band_T(h, hp, p, a_y, b_y)                            # (hp, h)
        BxT = _band_T(w, wp, p, a_x, b_x)                            # (wp, w)
        rowsA = jnp.einsum("uy,byx->bux", ByT, G_d, preferred_element_type=jnp.float32)
        A_d = jnp.einsum("bux,vx->buv", rowsA, BxT, preferred_element_type=jnp.float32)
        ByT2 = _band_T(h, hp, p, a_y + dy, b_y + dy)
        BxT2 = _band_T(w, wp, p, a_x + dx, b_x + dx)
        rowsS = jnp.einsum("uy,byx->bux", ByT2, G_d, preferred_element_type=jnp.float32)
        shiftA = jnp.einsum("bux,vx->buv", rowsS, BxT2, preferred_element_type=jnp.float32)
        P_pd = lax.dynamic_slice(Pbig, (0, 0, p + dy, p + dx), (b, c, hp, wp))
        P_md = lax.dynamic_slice(Pbig, (0, 0, p - dy, p - dx), (b, c, hp, wp))
        acc1 = (acc1 + A_d[:, None] * P_pd.astype(jnp.float32)
                + shiftA[:, None] * P_md.astype(jnp.float32))
        return (acc1, sumShiftA + shiftA, sumG + G_d), None

    init = (jnp.zeros((b, c, hp, wp)), jnp.zeros((b, hp, wp)), jnp.zeros((b, h, w)))
    (acc1, sumShiftA, sumG), _ = lax.scan(jax.checkpoint(passB), init, jnp.arange(n2),
                                          unroll=_SCAN_UNROLL)

    # epilogue: dP = 2[ P*(sum shiftA + A9) - acc1 ]  (the sumA term of the
    # C-correction cancels against the unfactored form's -sumA)
    By9T = _band_T(h, hp, p, -k, k)
    Bx9T = _band_T(w, wp, p, -k, k)
    rows9 = jnp.einsum("uy,byx->bux", By9T, sumG, preferred_element_type=jnp.float32)
    A9 = jnp.einsum("bux,vx->buv", rows9, Bx9T, preferred_element_type=jnp.float32)
    dP = 2.0 * ((sumShiftA + A9)[:, None] * P.astype(jnp.float32) - acc1)

    # adjoint of reflect-pad
    _, pad_vjp = jax.vjp(lambda im: reflect_pad_2d(im, p), sr)
    (d_sr,) = pad_vjp(dP)
    return d_sr


def _ssl_loss_dense_core(sr: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray,
                         cfg: SSGConfig = SSGConfig()):
    """Core forward; returns (l1_sum, kl_sum, count, inv_sr, inv_gt)."""
    b, c, h, w = sr.shape
    n2 = cfg.search * cfg.search
    norm = c * float(cfg.window) ** 2
    # sr and gt ride the SAME stacked batch (2b): one context, one band matmul
    # per offset at double width — better MXU utilization than two half-size
    # dispatch chains.
    ctx = _dense_context_b(jnp.concatenate([sr, jax.lax.stop_gradient(gt)], axis=0), cfg)
    mask = mask.astype(sr.dtype)
    count = jnp.sum(mask)

    def q_maps(s):
        q = jnp.exp(-(_dense_smap_b(ctx, s, cfg, h, w) / norm) / cfg.sigma)
        return q[:b], q[b:]

    if cfg.generalization:
        def pass1(carry, s):
            r_sr, r_gt = carry
            q_sr, q_gt = q_maps(s)
            return (r_sr + q_sr, r_gt + q_gt), None

        (r_sr, r_gt), _ = lax.scan(jax.checkpoint(pass1),
                                   (jnp.zeros((b, h, w)), jnp.zeros((b, h, w))),
                                   jnp.arange(n2), unroll=_SCAN_UNROLL)
        inv_sr = 1.0 / (r_sr + 1e-10)
        inv_gt = 1.0 / (r_gt + 1e-10)
    else:
        inv_sr = inv_gt = jnp.ones((b, h, w))

    def pass2(carry, s):
        l1_acc, kl_acc, a_acc, b_acc = carry
        q_sr, q_gt = q_maps(s)
        x = q_sr * inv_sr
        y = q_gt * inv_gt
        l1_acc = l1_acc + jnp.sum(mask * jnp.abs(x - y))
        xs = jnp.clip(x, min=1e-10)
        ys = jnp.clip(y, min=1e-10)
        kl_acc = kl_acc + jnp.sum(mask * (ys * (jnp.log(ys) - jnp.log(xs))))
        # backward helpers (see ssl_loss_dense_bwd): A = sum_d sign(x-y) x,
        # B = sum_d y * [x > eps]; lets the bwd skip its own T pass
        a_acc = a_acc + jnp.sign(x - y) * x
        b_acc = b_acc + y * (x > 1e-10)
        return (l1_acc, kl_acc, a_acc, b_acc), None

    (l1_sum, kl_sum, a_map, b_map), _ = lax.scan(
        jax.checkpoint(pass2),
        (jnp.asarray(0.0), jnp.asarray(0.0), jnp.zeros((b, h, w)), jnp.zeros((b, h, w))),
        jnp.arange(n2), unroll=_SCAN_UNROLL)
    return l1_sum, kl_sum, count, inv_sr, inv_gt, a_map, b_map


# ---------------------------------------------------------------------------
# Stored-q fast path: materialize all search-offset q maps once in HBM
# ---------------------------------------------------------------------------
# The scanned core evaluates every q map THREE times (pass1 row-sums, pass2
# loss accumulation, backward) — each evaluation is a dynamic slice, a
# c-channel squared-difference plane, two banded matmuls and an exp.  When
# n2·2b·h·w·4 bytes fit comfortably in HBM (1.3 GB at the shipped bench
# config), computing the q stack ONCE and streaming it back is far cheaper:
# HBM traffic of a few GB (~ms at v5e's ~800 GB/s) replaces two full
# recompute sweeps.  Exact fp32 storage — no precision tradeoff vs the
# scanned path; selection happens in losses/ssl_loss.py by memory estimate.

def _q_stack(ctx, b, h, w, cfg: SSGConfig):
    """All q maps, stacked: (n2, 2b, h, w) in cfg.q_store_dtype.

    Also returns the fp32 offset-sums (2b, h, w), accumulated from the
    PRE-cast q inside the same scan — so the row-normalization denominators
    are fp32-exact even with bf16 storage.

    With reduced-precision storage the second half holds the DIFFERENCE
    ``q_sr - q_gt`` (computed fp32, then rounded) instead of ``q_gt``:
    rounding q_sr and q_gt independently randomizes ``sign(x - y)`` wherever
    the patches are near-identical (|x-y| below the rounding step), which is
    exactly where the L1 subgradient lives.  Rounding the difference itself
    keeps its sign to ~2^-9 RELATIVE error, so the subgradient direction
    survives (test_stored_bf16_deviation)."""
    n2 = cfg.search * cfg.search
    norm = ctx[0].shape[1] * float(cfg.window) ** 2       # c * window^2
    store = jnp.dtype(cfg.q_store_dtype)
    delta = store != jnp.dtype(jnp.float32)

    def body(r, s):
        q = jnp.exp(-(_dense_smap_b(ctx, s, cfg, h, w) / norm) / cfg.sigma)
        out = jnp.concatenate([q[:b], q[:b] - q[b:]], axis=0) if delta else q
        return r + q, out.astype(store)

    nb = ctx[0].shape[0]
    r, qs = lax.scan(body, jnp.zeros((nb, h, w)), jnp.arange(n2),
                     unroll=_SCAN_UNROLL)
    return qs, r


def _q_decode(first, second, cfg: SSGConfig):
    """Decode stored halves -> fp32 (q_sr, q_gt) (see _q_stack): identity for
    fp32 storage, difference reconstruction (clipped at 0) otherwise."""
    if jnp.dtype(cfg.q_store_dtype) == jnp.dtype(jnp.float32):
        return first, second
    q_sr = first.astype(jnp.float32)
    return q_sr, jnp.maximum(q_sr - second.astype(jnp.float32), 0.0)


def _paired_bounds(s, cfg: SSGConfig):
    """Window bounds for offset index s (= +d) AND its mirror -d.

    Returns (dy, dx, bounds(+d), bounds(-d)).  The mirror of flat index s is
    n2-1-s (search is odd), whose offset is exactly -d."""
    p, k = cfg.search // 2, cfg.window // 2
    dy = s // cfg.search - p
    dx = s % cfg.search - p
    bp = (jnp.maximum(-k, -p - dy), jnp.minimum(k, p - dy),
          jnp.maximum(-k, -p - dx), jnp.minimum(k, p - dx))
    bm = (jnp.maximum(-k, -p + dy), jnp.minimum(k, p + dy),
          jnp.maximum(-k, -p + dx), jnp.minimum(k, p + dx))
    return dy, dx, bp, bm


def _q_stack_paired(ctx, b, h, w, cfg: SSGConfig):
    """Offset-PAIRED q stack: (n2//2, 2, 2b, h, w) for offsets (+d, -d),
    plus the fp32 offset-sums r INCLUDING the analytic center offset (d=0,
    where the windowed SSD is identically 0 so q ≡ 1 — bit-equal to what the
    scan would compute since P - P = 0 exactly in any dtype).

    One squared-difference map D per pair: D_{-d}(u,v) = D_{+d}(u-dy, v-dx),
    and a shift of a banded box-sum is the same box-sum under offset band
    bounds, so the mirror's rect rides two more small matmuls instead of a
    second Pbig slice + (2b, c, hp, wp) squared-difference stream.  center2
    is offset-independent, hence its own (-d)-banded rect."""
    search = cfg.search
    p = search // 2
    n2 = search * search
    half = n2 // 2
    norm = ctx[0].shape[1] * float(cfg.window) ** 2       # c * window^2
    store = jnp.dtype(cfg.q_store_dtype)
    delta = store != jnp.dtype(jnp.float32)
    P, Pbig, center2, box_c2 = ctx
    nb, c, hp, wp = P.shape

    def enc(q):
        out = jnp.concatenate([q[:b], q[:b] - q[b:]], axis=0) if delta else q
        return out.astype(store)

    def body(r, s):
        dy, dx, (a_y, b_y, a_x, b_x), (m_y, n_y, m_x, n_x) = _paired_bounds(s, cfg)
        Pshift = lax.dynamic_slice(Pbig, (0, 0, p + dy, p + dx), (nb, c, hp, wp))
        D = jnp.sum((P - Pshift) ** 2, axis=1, dtype=jnp.float32)
        # +d: fold center2 into the same banded box-sum (as _dense_smap_b)
        By = _band_matrix(h, hp, p, a_y, b_y)
        Bx = _band_matrix(w, wp, p, a_x, b_x)
        rows = jnp.einsum("yu,buv->byv", By, D - center2,
                          preferred_element_type=jnp.float32)
        rect_p = jnp.einsum("byv,xv->byx", rows, Bx,
                            preferred_element_type=jnp.float32) + box_c2
        # -d: box-sum of the SHIFTED D under offset band bounds, minus the
        # (-d)-banded box of the unshifted center2
        By2 = _band_matrix(h, hp, p, m_y - dy, n_y - dy)
        Bx2 = _band_matrix(w, wp, p, m_x - dx, n_x - dx)
        rowsD = jnp.einsum("yu,buv->byv", By2, D, preferred_element_type=jnp.float32)
        rectD = jnp.einsum("byv,xv->byx", rowsD, Bx2, preferred_element_type=jnp.float32)
        ByC = _band_matrix(h, hp, p, m_y, n_y)
        BxC = _band_matrix(w, wp, p, m_x, n_x)
        rowsC = jnp.einsum("yu,buv->byv", ByC, center2, preferred_element_type=jnp.float32)
        rectC = jnp.einsum("byv,xv->byx", rowsC, BxC, preferred_element_type=jnp.float32)
        rect_m = rectD - rectC + box_c2
        q_p = jnp.exp(-(rect_p / norm) / cfg.sigma)
        q_m = jnp.exp(-(rect_m / norm) / cfg.sigma)
        return r + q_p + q_m, jnp.stack([enc(q_p), enc(q_m)])

    r, qs = lax.scan(body, jnp.zeros((nb, h, w)), jnp.arange(half),
                     unroll=_SCAN_UNROLL)
    return qs, r + 1.0  # center offset: q ≡ 1


def _ssl_loss_dense_core_stored(sr, gt, mask, cfg: SSGConfig):
    b, c, h, w = sr.shape
    ctx = _dense_context_b(jnp.concatenate([sr, jax.lax.stop_gradient(gt)], axis=0), cfg)
    mask = mask.astype(sr.dtype)
    count = jnp.sum(mask)
    if cfg.pair_offsets:
        qs, r = _q_stack_paired(ctx, b, h, w, cfg)        # (n2//2, 2, 2b, h, w)
        q_flat = qs.reshape((-1,) + qs.shape[2:])
    else:
        qs, r = _q_stack(ctx, b, h, w, cfg)               # (n2, 2b, h, w)
        q_flat = qs
    q_sr, q_gt = _q_decode(q_flat[:, :b], q_flat[:, b:], cfg)
    if cfg.generalization:
        inv_sr = 1.0 / (r[:b] + 1e-10)
        inv_gt = 1.0 / (r[b:] + 1e-10)
    else:
        inv_sr = inv_gt = jnp.ones((b, h, w))
    x = q_sr * inv_sr[None]
    y = q_gt * inv_gt[None]
    l1_sum = jnp.sum(mask[None] * jnp.abs(x - y))
    xs_ = jnp.clip(x, min=1e-10)
    ys_ = jnp.clip(y, min=1e-10)
    kl_sum = jnp.sum(mask[None] * (ys_ * (jnp.log(ys_) - jnp.log(xs_))))
    a_map = jnp.sum(jnp.sign(x - y) * x, axis=0)
    b_map = jnp.sum(y * (x > 1e-10), axis=0)
    if cfg.pair_offsets:
        # center offset (q ≡ 1): x = inv_sr, y = inv_gt, analytically
        xc, yc = inv_sr, inv_gt
        l1_sum = l1_sum + jnp.sum(mask * jnp.abs(xc - yc))
        xs_c = jnp.clip(xc, min=1e-10)
        ys_c = jnp.clip(yc, min=1e-10)
        kl_sum = kl_sum + jnp.sum(mask * (ys_c * (jnp.log(ys_c) - jnp.log(xs_c))))
        a_map = a_map + jnp.sign(xc - yc) * xc
        b_map = b_map + yc * (xc > 1e-10)
    return l1_sum, kl_sum, count, inv_sr, inv_gt, a_map, b_map, qs


def _ssl_dense_bwd_stored(sr, gt, mask, inv_sr, inv_gt, g_l1, g_kl, qs,
                          cfg: SSGConfig, a_map, b_map):
    """Analytic backward consuming the stored q stack, in FACTORED form.

    Same maths as ssl_loss_dense_bwd, rearranged so no per-offset (b,c,·)
    tensor is materialized or canvas-shifted.  With shiftA_d(r) = A_d(r-d)
    (zero-filled) and P±d the Pbig slices:

      shift_d(A_d·(P - P_d)) = shiftA_d · (P_{-d} - P)        (exact, incl.
      borders: shiftA_d vanishes exactly where the identities would fail)

      dP = 2·[ P·(ΣshiftA_d + A9) - Σ_d (A_d·P_d + shiftA_d·P_{-d}) ]

    (the ΣA_d term cancels against the C-term's -sumA).  Per offset this
    shifts only the channel-less A_d map and streams two Pbig slices into one
    accumulator — ~2-3x less HBM traffic than the canvas formulation."""
    b, c, h, w = sr.shape
    search = cfg.search
    p, k = search // 2, cfg.window // 2
    n2 = search * search
    norm = c * float(cfg.window) ** 2
    scale = -1.0 / (norm * cfg.sigma)
    P = reflect_pad_2d(sr, p)
    Pbig = jnp.pad(P.astype(cfg.stream_dtype), ((0, 0), (0, 0), (p, p), (p, p)))
    hp, wp = P.shape[2], P.shape[3]
    mask = mask.astype(sr.dtype)

    T = ((1.0 / inv_sr) * mask * (g_l1 * a_map - g_kl * b_map)
         if cfg.generalization else jnp.zeros((b, h, w)))

    def passB(carry, inputs):
        acc1, sumShiftA, sumG = carry
        s, q2 = inputs
        q_sr, q_gt = _q_decode(q2[:b], q2[b:], cfg)
        dy, dx, a_y, b_y, a_x, b_x = _shift_bounds(s, cfg)
        x = q_sr * inv_sr
        y = q_gt * inv_gt
        g_d = mask * (g_l1 * jnp.sign(x - y) +
                      g_kl * jnp.where(x > 1e-10, -y / jnp.clip(x, min=1e-10), 0.0))
        G_d = (inv_sr * g_d - inv_sr * inv_sr * T) * q_sr * scale
        ByT = _band_T(h, hp, p, a_y, b_y)
        BxT = _band_T(w, wp, p, a_x, b_x)
        rowsA = jnp.einsum("uy,byx->bux", ByT, G_d, preferred_element_type=jnp.float32)
        A_d = jnp.einsum("bux,vx->buv", rowsA, BxT, preferred_element_type=jnp.float32)
        # shiftA_d(u,v) = A_d(u-dy, v-dx) zero-filled.  A shift of a band-
        # matmul product is the SAME product under offset band bounds:
        #   shift_d(ByT G BxT^T) = ByT' G BxT'^T,
        #   ByT' = band(a_y+dy, b_y+dy), BxT' = band(a_x+dx, b_x+dx)
        # (rows/cols that would leave the canvas have empty bands, exactly
        # reproducing the zero fill) — two more MXU matmuls instead of a
        # (b, hp+2p, wp+2p) canvas alloc + dynamic-update + crop per offset.
        ByT2 = _band_T(h, hp, p, a_y + dy, b_y + dy)
        BxT2 = _band_T(w, wp, p, a_x + dx, b_x + dx)
        rowsS = jnp.einsum("uy,byx->bux", ByT2, G_d, preferred_element_type=jnp.float32)
        shiftA = jnp.einsum("bux,vx->buv", rowsS, BxT2, preferred_element_type=jnp.float32)
        P_pd = lax.dynamic_slice(Pbig, (0, 0, p + dy, p + dx), (b, c, hp, wp))
        P_md = lax.dynamic_slice(Pbig, (0, 0, p - dy, p - dx), (b, c, hp, wp))
        acc1 = (acc1 + A_d[:, None] * P_pd.astype(jnp.float32)
                + shiftA[:, None] * P_md.astype(jnp.float32))
        return (acc1, sumShiftA + shiftA, sumG + G_d), None

    init = (jnp.zeros((b, c, hp, wp)), jnp.zeros((b, hp, wp)), jnp.zeros((b, h, w)))
    (acc1, sumShiftA, sumG), _ = lax.scan(passB, init, (jnp.arange(n2), qs),
                                          unroll=_SCAN_UNROLL)

    By9T = _band_T(h, hp, p, -k, k)
    Bx9T = _band_T(w, wp, p, -k, k)
    rows9 = jnp.einsum("uy,byx->bux", By9T, sumG, preferred_element_type=jnp.float32)
    A9 = jnp.einsum("bux,vx->buv", rows9, Bx9T, preferred_element_type=jnp.float32)
    dP = 2.0 * ((sumShiftA + A9)[:, None] * P - acc1)

    _, pad_vjp = jax.vjp(lambda im: reflect_pad_2d(im, p), sr)
    (d_sr,) = pad_vjp(dP)
    return d_sr


def _ssl_dense_bwd_stored_paired(sr, gt, mask, inv_sr, inv_gt, g_l1, g_kl, qs,
                                 cfg: SSGConfig, a_map, b_map):
    """Offset-PAIRED twin of _ssl_dense_bwd_stored.

    Per (+d, -d) pair the two Pbig slices are swaps of each other
    (P_{+e}|_{e=-d} = P_{-d-slice}), so each slice is streamed ONCE and the
    pair's four A/shiftA maps fold into the same two channel-broadcast
    accumulations:

      acc1 += (A_{+d} + shiftA_{-d})·P_{+d} + (A_{-d} + shiftA_{+d})·P_{-d}

    The center offset (d = 0, q ≡ 1) is added analytically after the scan
    with the full-window band (its A = shiftA and both slices are P)."""
    b, c, h, w = sr.shape
    search = cfg.search
    p, k = search // 2, cfg.window // 2
    norm = c * float(cfg.window) ** 2
    scale = -1.0 / (norm * cfg.sigma)
    P = reflect_pad_2d(sr, p)
    Pbig = jnp.pad(P.astype(cfg.stream_dtype), ((0, 0), (0, 0), (p, p), (p, p)))
    hp, wp = P.shape[2], P.shape[3]
    mask = mask.astype(sr.dtype)

    T = ((1.0 / inv_sr) * mask * (g_l1 * a_map - g_kl * b_map)
         if cfg.generalization else jnp.zeros((b, h, w)))

    def g_map(q_sr, q_gt):
        x = q_sr * inv_sr
        y = q_gt * inv_gt
        g_d = mask * (g_l1 * jnp.sign(x - y) +
                      g_kl * jnp.where(x > 1e-10, -y / jnp.clip(x, min=1e-10), 0.0))
        return (inv_sr * g_d - inv_sr * inv_sr * T) * q_sr * scale

    def band_box(G, lo_y, hi_y, lo_x, hi_x):
        ByT = _band_T(h, hp, p, lo_y, hi_y)
        BxT = _band_T(w, wp, p, lo_x, hi_x)
        rows = jnp.einsum("uy,byx->bux", ByT, G, preferred_element_type=jnp.float32)
        return jnp.einsum("bux,vx->buv", rows, BxT, preferred_element_type=jnp.float32)

    def passB(carry, inputs):
        acc1, sumShiftA, sumG = carry
        s, qpair = inputs
        dy, dx, (a_y, b_y, a_x, b_x), (m_y, n_y, m_x, n_x) = _paired_bounds(s, cfg)
        G_p = g_map(*_q_decode(qpair[0, :b], qpair[0, b:], cfg))
        G_m = g_map(*_q_decode(qpair[1, :b], qpair[1, b:], cfg))
        A_p = band_box(G_p, a_y, b_y, a_x, b_x)
        S_p = band_box(G_p, a_y + dy, b_y + dy, a_x + dx, b_x + dx)
        A_m = band_box(G_m, m_y, n_y, m_x, n_x)
        S_m = band_box(G_m, m_y - dy, n_y - dy, m_x - dx, n_x - dx)
        P_pd = lax.dynamic_slice(Pbig, (0, 0, p + dy, p + dx), (b, c, hp, wp))
        P_md = lax.dynamic_slice(Pbig, (0, 0, p - dy, p - dx), (b, c, hp, wp))
        acc1 = (acc1 + (A_p + S_m)[:, None] * P_pd.astype(jnp.float32)
                + (A_m + S_p)[:, None] * P_md.astype(jnp.float32))
        return (acc1, sumShiftA + S_p + S_m, sumG + G_p + G_m), None

    half = (search * search) // 2
    init = (jnp.zeros((b, c, hp, wp)), jnp.zeros((b, hp, wp)), jnp.zeros((b, h, w)))
    (acc1, sumShiftA, sumG), _ = lax.scan(passB, init, (jnp.arange(half), qs),
                                          unroll=_SCAN_UNROLL)

    # center offset: q ≡ 1 so x = inv_sr, y = inv_gt; d = 0 → shiftA = A and
    # both slices are P itself (through the same stream-dtype round trip)
    G_c = g_map(jnp.ones((b, h, w)), jnp.ones((b, h, w)))
    A_c = band_box(G_c, -k, k, -k, k)
    P0 = P.astype(cfg.stream_dtype).astype(jnp.float32)
    acc1 = acc1 + (2.0 * A_c)[:, None] * P0
    sumShiftA = sumShiftA + A_c
    sumG = sumG + G_c

    By9T = _band_T(h, hp, p, -k, k)
    Bx9T = _band_T(w, wp, p, -k, k)
    rows9 = jnp.einsum("uy,byx->bux", By9T, sumG, preferred_element_type=jnp.float32)
    A9 = jnp.einsum("bux,vx->buv", rows9, Bx9T, preferred_element_type=jnp.float32)
    dP = 2.0 * ((sumShiftA + A9)[:, None] * P - acc1)

    _, pad_vjp = jax.vjp(lambda im: reflect_pad_2d(im, p), sr)
    (d_sr,) = pad_vjp(dP)
    return d_sr


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ssl_loss_dense_stored(sr: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray,
                          cfg: SSGConfig = SSGConfig()):
    """Stored-q variant of ssl_loss_dense_batched — same contract, q maps
    computed once and reused by the loss reduction AND the analytic VJP."""
    l1_sum, kl_sum, count, *_ = _ssl_loss_dense_core_stored(sr, gt, mask, cfg)
    return l1_sum, kl_sum, count


def _ssl_stored_fwd(sr, gt, mask, cfg):
    l1_sum, kl_sum, count, inv_sr, inv_gt, a_map, b_map, qs = \
        _ssl_loss_dense_core_stored(sr, gt, mask, cfg)
    return (l1_sum, kl_sum, count), (sr, gt, mask, inv_sr, inv_gt, a_map, b_map, qs)


def _ssl_stored_bwd(cfg, res, g):
    sr, gt, mask, inv_sr, inv_gt, a_map, b_map, qs = res
    g_l1, g_kl, _ = g
    bwd = _ssl_dense_bwd_stored_paired if cfg.pair_offsets else _ssl_dense_bwd_stored
    d_sr = bwd(sr, gt, mask, inv_sr, inv_gt, g_l1, g_kl, qs, cfg, a_map, b_map)
    return d_sr, jnp.zeros_like(gt), jnp.zeros_like(mask)


ssl_loss_dense_stored.defvjp(_ssl_stored_fwd, _ssl_stored_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ssl_loss_dense_batched(sr: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray,
                           cfg: SSGConfig = SSGConfig()):
    """Fused masked-dense SSL loss sums for a BATCH.

    sr, gt: (b, c, h, w); mask: (b, h, w).  Returns (l1_sum, kl_sum, count)
    summed over the whole batch — divide by count*search^2 for the reference's
    torch-mean over concatenated per-image SSGs.  Differentiable w.r.t. sr via
    the ANALYTIC custom VJP (ssl_loss_dense_bwd) — one extra offset pass
    instead of autodiff's remat double-recompute; gt is a constant target."""
    l1_sum, kl_sum, count, _, _, _, _ = _ssl_loss_dense_core(sr, gt, mask, cfg)
    return l1_sum, kl_sum, count


def _ssl_dense_fwd(sr, gt, mask, cfg):
    l1_sum, kl_sum, count, inv_sr, inv_gt, a_map, b_map = \
        _ssl_loss_dense_core(sr, gt, mask, cfg)
    return (l1_sum, kl_sum, count), (sr, gt, mask, inv_sr, inv_gt, a_map, b_map)


def _ssl_dense_bwd(cfg, res, g):
    sr, gt, mask, inv_sr, inv_gt, a_map, b_map = res
    g_l1, g_kl, _ = g
    d_sr = ssl_loss_dense_bwd(sr, gt, mask, inv_sr, inv_gt, g_l1, g_kl, cfg,
                              a_map=a_map, b_map=b_map)
    return d_sr, jnp.zeros_like(gt), jnp.zeros_like(mask)


ssl_loss_dense_batched.defvjp(_ssl_dense_fwd, _ssl_dense_bwd)


def _dense_context(img: jnp.ndarray, cfg: SSGConfig):
    """Precompute padded image + center^2 prefix structures for dense S maps."""
    search, window = cfg.search, cfg.window
    p, k = search // 2, window // 2
    c, h, w = img.shape
    P = reflect_pad_2d(img, p)
    Pbig = jnp.pad(P, ((0, 0), (p, p), (p, p)))
    center2 = jnp.sum(P * P, axis=0)
    c2_prefix = _prefix_rows(center2)
    full_rows = c2_prefix[p + k + 1:p + k + 1 + h] - c2_prefix[p - k:p - k + h]
    box_c2 = _rect_cols(full_rows, -k, k, p, w)
    return P, Pbig, c2_prefix, box_c2


def _dense_smap(ctx, s, cfg: SSGConfig, h: int, w: int):
    """Dense raw-SSD map (h,w) for search-offset index s."""
    search, window = cfg.search, cfg.window
    p, k = search // 2, window // 2
    P, Pbig, c2_prefix, box_c2 = ctx
    c = P.shape[0]
    hp, wp = P.shape[1], P.shape[2]
    dy = s // search - p
    dx = s % search - p
    Pshift = lax.dynamic_slice(Pbig, (0, p + dy, p + dx), (c, hp, wp))
    D = jnp.sum((P - Pshift) ** 2, axis=0)
    a_y = jnp.maximum(-k, -p - dy)
    b_y = jnp.minimum(k, p - dy)
    a_x = jnp.maximum(-k, -p - dx)
    b_x = jnp.minimum(k, p - dx)
    rect_d = _rect_cols(_rect_rows(_prefix_rows(D), a_y, b_y, p, h), a_x, b_x, p, w)
    rect_c = _rect_cols(_rect_rows(c2_prefix, a_y, b_y, p, h), a_x, b_x, p, w)
    return rect_d + (box_c2 - rect_c)


def ssl_loss_dense(sr: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray,
                   cfg: SSGConfig = SSGConfig()):
    """Fused masked-dense SSL loss sums for ONE image pair (vmap over batch).

    sr, gt: (c,h,w); mask: (h,w) binary.  Returns (l1_sum, kl_sum, count):
    sums of |q_sr - q_gt| and KL pointwise terms over (edge pixels x search^2)
    and the edge-pixel count — callers divide by count*search^2 for the
    reference's torch-mean reduction.

    TPU-native design: instead of gathering per-edge-pixel rows (ragged), the
    whole dense similarity field is computed per search offset under a
    two-pass lax.scan (pass 1: row-normalization denominators; pass 2: masked
    loss accumulation).  Exact for ANY number of edge pixels — unlike the
    fixed-capacity gather path there is no truncation.  KL here is the shipped
    softmax=False variant (clamp 1e-10)."""
    c, h, w = sr.shape
    search = cfg.search
    n2 = search * search
    norm = c * float(cfg.window) ** 2
    ctx_sr = _dense_context(sr, cfg)
    ctx_gt = _dense_context(jax.lax.stop_gradient(gt), cfg)
    mask = mask.astype(sr.dtype)
    count = jnp.sum(mask)

    def q_maps(s):
        q_sr = jnp.exp(-(_dense_smap(ctx_sr, s, cfg, h, w) / norm) / cfg.sigma)
        q_gt = jnp.exp(-(_dense_smap(ctx_gt, s, cfg, h, w) / norm) / cfg.sigma)
        return q_sr, q_gt

    if cfg.generalization:
        def pass1(carry, s):
            r_sr, r_gt = carry
            q_sr, q_gt = q_maps(s)
            return (r_sr + q_sr, r_gt + q_gt), None

        (r_sr, r_gt), _ = lax.scan(jax.checkpoint(pass1),
                                   (jnp.zeros((h, w)), jnp.zeros((h, w))),
                                   jnp.arange(n2))
        inv_sr = 1.0 / (r_sr + 1e-10)
        inv_gt = 1.0 / (r_gt + 1e-10)
    else:
        inv_sr = inv_gt = jnp.ones((h, w))

    def pass2(carry, s):
        l1_acc, kl_acc = carry
        q_sr, q_gt = q_maps(s)
        x = q_sr * inv_sr
        y = q_gt * inv_gt
        l1_acc = l1_acc + jnp.sum(mask * jnp.abs(x - y))
        xs = jnp.clip(x, min=1e-10)
        ys = jnp.clip(y, min=1e-10)
        kl_acc = kl_acc + jnp.sum(mask * (ys * (jnp.log(ys) - jnp.log(xs))))
        return (l1_acc, kl_acc), None

    (l1_sum, kl_sum), _ = lax.scan(jax.checkpoint(pass2), (jnp.asarray(0.0), jnp.asarray(0.0)),
                                   jnp.arange(n2))
    return l1_sum, kl_sum, count
