"""Pallas TPU kernel for the fused masked-dense SSL loss (forward).

One grid program per image pair keeps BOTH padded images, the mask, and all
accumulators resident in VMEM across the search-offset loop — zero HBM
traffic per offset (the XLA scan version round-trips carry/intermediate maps).
Box-sums use the same banded-matrix MXU formulation as ops/ssg.py; shifted
windows are read straight from the VMEM ref with ``pl.ds`` dynamic slices.

Contract: ``ssl_loss_sums_pallas(sr, gt, mask, cfg) -> (l1_sum, kl_sum, count)``
matching ``ssl_loss_dense_batched``; wrapped in ``custom_vjp`` whose backward
recomputes through the XLA dense path (analytic Pallas backward is a planned
follow-up — the loss stays trainable either way)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

try:  # TPU backend module; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from ssl_tpu.ops.ssg import SSGConfig, reflect_pad_2d


def _band(n_out: int, n_in: int, p: int, lo, hi):
    yy = lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0)
    uu = lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    d = uu - yy - p
    return jnp.logical_and(d >= lo, d <= hi).astype(jnp.float32)


def _make_kernel(cfg: SSGConfig, c: int, h: int, w: int, bblk: int = 1):
    search, window = cfg.search, cfg.window
    p, k = search // 2, window // 2
    hp, wp = h + 2 * p, w + 2 * p
    n2 = search * search
    norm = c * float(window) ** 2

    def kernel(psr_ref, pgt_ref, mask_ref, l1_ref, kl_ref, cnt_ref,
               invs_ref, invg_ref):
        # blocks are (bblk, c, hb, wb) / (bblk, h, w)
        mask = mask_ref[:]

        # center views (static slices of the big padded block)
        P_sr = psr_ref[:, :, p:p + hp, p:p + wp]
        P_gt = pgt_ref[:, :, p:p + hp, p:p + wp]
        c2_sr = jnp.sum(P_sr * P_sr, axis=1)
        c2_gt = jnp.sum(P_gt * P_gt, axis=1)
        By9 = _band(h, hp, p, -k, k)
        Bx9 = _band(w, wp, p, -k, k)

        def box9(m):
            rows = jnp.einsum("yu,buv->byv", By9, m, preferred_element_type=jnp.float32)
            return jnp.einsum("byv,xv->byx", rows, Bx9, preferred_element_type=jnp.float32)

        box_sr = box9(c2_sr)
        box_gt = box9(c2_gt)

        # Mosaic constraint: dynamic slicing of the minor (lane) dim must be
        # 128-aligned — so only the sublane shift (dy) is dynamic (fori_loop);
        # the 25 lane shifts (dx) are a STATIC unrolled loop with constant
        # slices and constant-folded Bx band matrices.
        bx_bands = [
            _band(w, wp, p, max(-k, -p - dxv), min(k, p - dxv)).T
            for dxv in range(-p, p + 1)
        ]

        def q_row(ref, P, c2, box, dy, dxi, by):
            dxv = dxi - p  # static
            # Mosaic requires sublane starts to be provably 8-aligned: read an
            # 8-aligned base span, then switch over the 8 residual row shifts
            # (each branch a static sub-slice).
            start = p + dy
            q8 = (start // 8) * 8
            r = start - q8
            base = ref[:, :, pl.ds(pl.multiple_of(q8, 8), hp + 8),
                       p + dxv:p + dxv + wp]
            pshift = lax.switch(r, [
                (lambda rr: (lambda: base[:, :, rr:rr + hp, :]))(rr) for rr in range(8)
            ])
            D = jnp.sum((P - pshift) ** 2, axis=1) - c2
            rows = jnp.einsum("yu,buv->byv", by, D, preferred_element_type=jnp.float32)
            smap = jnp.einsum("byv,vx->byx", rows, bx_bands[dxi],
                              preferred_element_type=jnp.float32) + box
            return jnp.exp(-(smap / norm) / cfg.sigma)

        def by_of(dy):
            return _band(h, hp, p, jnp.maximum(-k, -p - dy), jnp.minimum(k, p - dy))

        if cfg.generalization:
            def pass1(i, carry):
                rs, rg = carry
                dy = i - p
                by = by_of(dy)
                for dxi in range(search):
                    rs = rs + q_row(psr_ref, P_sr, c2_sr, box_sr, dy, dxi, by)
                    rg = rg + q_row(pgt_ref, P_gt, c2_gt, box_gt, dy, dxi, by)
                return (rs, rg)

            rs, rg = lax.fori_loop(0, search, pass1,
                                   (jnp.zeros((bblk, h, w)), jnp.zeros((bblk, h, w))))
            inv_sr = 1.0 / (rs + 1e-10)
            inv_gt = 1.0 / (rg + 1e-10)
        else:
            inv_sr = inv_gt = jnp.ones((bblk, h, w))

        def pass2(i, carry):
            l1, kl = carry
            dy = i - p
            by = by_of(dy)
            for dxi in range(search):
                x = q_row(psr_ref, P_sr, c2_sr, box_sr, dy, dxi, by) * inv_sr
                y = q_row(pgt_ref, P_gt, c2_gt, box_gt, dy, dxi, by) * inv_gt
                l1 = l1 + jnp.sum(mask * jnp.abs(x - y))
                xs = jnp.clip(x, min=1e-10)
                ys = jnp.clip(y, min=1e-10)
                kl = kl + jnp.sum(mask * (ys * (jnp.log(ys) - jnp.log(xs))))
            return (l1, kl)

        l1, kl = lax.fori_loop(0, search, pass2,
                               (jnp.asarray(0.0), jnp.asarray(0.0)))
        l1_ref[:] = jnp.reshape(l1, (1, 1, 1))
        kl_ref[:] = jnp.reshape(kl, (1, 1, 1))
        cnt_ref[:] = jnp.reshape(jnp.sum(mask), (1, 1, 1))
        invs_ref[:] = inv_sr
        invg_ref[:] = inv_gt

    return kernel


def _pallas_forward(sr, gt, mask, cfg: SSGConfig, interpret: bool = False):
    """sr, gt: (b, c, h, w); mask: (b, h, w) -> per-block (l1, kl, count) and
    per-image inv maps.  Several images ride each grid program (B_BLK) so the
    in-kernel band matmuls are batched (better MXU utilization) while staying
    VMEM-resident."""
    import os as _os
    b, c, h, w = sr.shape
    bblk = max(1, min(int(_os.environ.get("SSG_PALLAS_BBLK", "1")), b))
    while b % bblk:
        bblk -= 1
    p = cfg.search // 2
    # +8 extra bottom rows: the kernel reads 8-aligned sublane spans of hp+8
    pad_sr = jnp.pad(reflect_pad_2d(sr, p), ((0, 0), (0, 0), (p, p + 8), (p, p)))
    pad_gt = jnp.pad(reflect_pad_2d(jax.lax.stop_gradient(gt), p),
                     ((0, 0), (0, 0), (p, p + 8), (p, p)))
    kernel = _make_kernel(cfg, c, h, w, bblk)
    hb, wb = pad_sr.shape[2], pad_sr.shape[3]
    nblk = b // bblk

    use_tpu_mem = _HAS_PLTPU and not interpret

    def spec(block, index_map):
        if use_tpu_mem:
            return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
        return pl.BlockSpec(block, index_map)

    l1, kl, cnt, inv_sr, inv_gt = pl.pallas_call(
        kernel,
        out_shape=([jax.ShapeDtypeStruct((nblk, 1, 1), jnp.float32) for _ in range(3)] +
                   [jax.ShapeDtypeStruct((b, h, w), jnp.float32) for _ in range(2)]),
        grid=(nblk,),
        in_specs=[
            spec((bblk, c, hb, wb), lambda i: (i, 0, 0, 0)),
            spec((bblk, c, hb, wb), lambda i: (i, 0, 0, 0)),
            spec((bblk, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=([spec((1, 1, 1), lambda i: (i, 0, 0)) for _ in range(3)] +
                   [spec((bblk, h, w), lambda i: (i, 0, 0)) for _ in range(2)]),
        interpret=interpret,
    )(pad_sr, pad_gt, mask)
    return l1.reshape(nblk), kl.reshape(nblk), cnt.reshape(nblk), inv_sr, inv_gt


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ssl_loss_sums_pallas(sr, gt, mask, cfg: SSGConfig = SSGConfig(),
                         interpret: bool = False):
    l1, kl, cnt, _, _ = _pallas_forward(sr, gt, mask, cfg, interpret)
    return jnp.sum(l1), jnp.sum(kl), jnp.sum(cnt)


def _fwd(sr, gt, mask, cfg, interpret):
    l1, kl, cnt, inv_sr, inv_gt = _pallas_forward(sr, gt, mask, cfg, interpret)
    return ((jnp.sum(l1), jnp.sum(kl), jnp.sum(cnt)),
            (sr, gt, mask, inv_sr, inv_gt))


def _bwd(cfg, interpret, res, g):
    # analytic XLA backward (band-matmul adjoint), fed the Pallas-computed
    # row-normalization maps — no forward recompute of pass 1.
    from ssl_tpu.ops.ssg import ssl_loss_dense_bwd
    sr, gt, mask, inv_sr, inv_gt = res
    g_l1, g_kl, _ = g
    d_sr = ssl_loss_dense_bwd(sr, gt, mask, inv_sr, inv_gt, g_l1, g_kl, cfg)
    return d_sr, jnp.zeros_like(gt), jnp.zeros_like(mask)


ssl_loss_sums_pallas.defvjp(_fwd, _bwd)


def ssg_ssd_maps_pallas(img: jnp.ndarray, cfg: SSGConfig, pos: jnp.ndarray):
    """Gather-API parity path: dense maps via the XLA formulation + take.
    (The Pallas kernel itself is loss-fused; per-position gathers don't map
    well onto TPU vector memory.)"""
    from ssl_tpu.ops.ssg import ssg_ssd_maps_scan
    return ssg_ssd_maps_scan(img, cfg, pos)
