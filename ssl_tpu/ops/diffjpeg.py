"""Differentiable JPEG in pure jnp (reference: utils/diffjpeg.py:49-491).

RGB->YCbCr, 2x chroma subsampling, 8x8 block DCT as matmuls (MXU-friendly),
quality-scaled quantization with a differentiable-round surrogate
(round(x) + (x-round(x))^3), then the inverse path.  Input NHWC [0,1]; pads
to /16 and crops back like the reference wrapper.

The quantization tables are the standard Annex-K luminance/chrominance
matrices from the JPEG specification (public constants)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# ITU-T T.81 Annex K base quantization tables.  The Y table is stored
# TRANSPOSED, matching the reference DiffJPEG's `y_table.T` convention
# (diffjpeg.py:18-24) relative to its block/DCT orientation — using the
# untransposed table quantizes the wrong frequencies (caught by the
# reference-oracle parity suite).
Y_TABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float32).T

C_TABLE = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.float32)


def _dct_matrix() -> np.ndarray:
    """8-point DCT-II basis, orthonormal; blocks transform as D @ X @ D.T."""
    d = np.zeros((8, 8), np.float32)
    for k in range(8):
        for n in range(8):
            d[k, n] = np.cos((2 * n + 1) * k * np.pi / 16.0)
        d[k] *= (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
    return d


_DCT = _dct_matrix()  # numpy: no device constant at import (multi-host init order)

_RGB2YCBCR = (np.array([
    [0.299, 0.587, 0.114],
    [-0.168736, -0.331264, 0.5],
    [0.5, -0.418688, -0.081312]], np.float32).T)
_YCBCR_SHIFT = np.array([0.0, 128.0, 128.0], np.float32)

_YCBCR2RGB = (np.array([
    [1.0, 0.0, 1.402],
    [1.0, -0.344136, -0.714136],
    [1.0, 1.772, 0.0]], np.float32).T)


def quality_to_factor(quality):
    """libjpeg quality scaling (reference diffjpeg.py:449-463)."""
    quality = jnp.asarray(quality, jnp.float32)
    return jnp.where(quality < 50, 5000.0 / quality, 200.0 - quality * 2.0) / 100.0


def _diff_round(x):
    r = jnp.round(x)
    return r + (x - r) ** 3


def _blockify(x):
    """(b,h,w) -> (b, nblocks, 8, 8)."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, -1, 8, 8)


def _unblockify(x, h, w):
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h, w)


def _dct8x8(blocks):
    return jnp.einsum("ij,bnjk,lk->bnil", _DCT, blocks, _DCT)


def _idct8x8(coefs):
    return jnp.einsum("ji,bnjk,kl->bnil", _DCT, coefs, _DCT)


def _avg_pool2(x):
    b, h, w = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


def _upsample2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def diff_jpeg(img: jnp.ndarray, quality, rounding=_diff_round) -> jnp.ndarray:
    """Differentiable JPEG round-trip. img NHWC RGB [0,1]; quality scalar or (b,)."""
    b, h, w, _ = img.shape
    # pad to /16 (chroma subsample + 8x8 blocks), crop at the end
    ph = (16 - h % 16) % 16
    pw = (16 - w % 16) % 16
    # constant-0 pad like the reference (diffjpeg.py:486); cropped away below
    x = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0))) * 255.0
    hp, wp = h + ph, w + pw

    ycc = x @ _RGB2YCBCR + _YCBCR_SHIFT
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    cb, cr = _avg_pool2(cb), _avg_pool2(cr)

    factor = jnp.broadcast_to(quality_to_factor(quality), (b,)).reshape(b, 1, 1, 1)

    def compress(chan, table):
        blocks = _blockify(chan - 128.0)
        coefs = _dct8x8(blocks)
        # raw table*factor scaling — the reference does NOT apply libjpeg's
        # floor+clip table rounding (diffjpeg.py:169 'y_table * factor')
        q = table * factor
        return rounding(coefs / q), q

    yq, qy = compress(y, jnp.asarray(Y_TABLE))
    cbq, qc = compress(cb, jnp.asarray(C_TABLE))
    crq, _ = compress(cr, jnp.asarray(C_TABLE))

    def decompress(coefs, q, hh, ww):
        return _unblockify(_idct8x8(coefs * q), hh, ww) + 128.0

    y2 = decompress(yq, qy, hp, wp)
    cb2 = _upsample2(decompress(cbq, qc, hp // 2, wp // 2))
    cr2 = _upsample2(decompress(crq, qc, hp // 2, wp // 2))

    ycc2 = jnp.stack([y2, cb2 - 128.0, cr2 - 128.0], axis=-1)
    rgb = ycc2 @ _YCBCR2RGB
    rgb = jnp.clip(rgb / 255.0, 0.0, 1.0)
    return rgb[:, :h, :w, :]
