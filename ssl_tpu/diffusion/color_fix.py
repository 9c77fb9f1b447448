"""Output color correction: AdaIN and wavelet color fix.

Reference parity: Diffusion-Based-SR/scripts/wavelet_color_fix.py (used by
test.py:322-341 — three outputs: nofix / adain / wavelet)."""

from __future__ import annotations

import numpy as np


def adain_color_fix(target: np.ndarray, source: np.ndarray) -> np.ndarray:
    """Match per-channel mean/std of target to source. HWC [0,1]."""
    t = target.astype(np.float64)
    s = source.astype(np.float64)
    t_mean, t_std = t.mean(axis=(0, 1)), t.std(axis=(0, 1)) + 1e-8
    s_mean, s_std = s.mean(axis=(0, 1)), s.std(axis=(0, 1)) + 1e-8
    out = (t - t_mean) / t_std * s_std + s_mean
    return np.clip(out, 0, 1).astype(np.float32)


def _wavelet_blur(img: np.ndarray, radius: int) -> np.ndarray:
    """A-trous wavelet blur: 5-tap binomial kernel with holes of size radius."""
    import cv2
    kernel_1d = np.array([1, 4, 6, 4, 1], np.float64) / 16.0
    k = np.outer(kernel_1d, kernel_1d)
    size = 4 * radius + 1
    dilated = np.zeros((size, size))
    dilated[::radius, ::radius] = k
    return cv2.filter2D(img, -1, dilated, borderType=cv2.BORDER_REPLICATE)


def wavelet_decomposition(img: np.ndarray, levels: int = 5):
    """Split into high-frequency detail + low-frequency residual."""
    high = np.zeros_like(img)
    low = img.astype(np.float64)
    for i in range(levels):
        radius = 2 ** i
        blurred = _wavelet_blur(low, radius)
        high = high + (low - blurred)
        low = blurred
    return high, low


def wavelet_color_fix(target: np.ndarray, source: np.ndarray) -> np.ndarray:
    """Keep target's high-frequency detail, take source's low-frequency color."""
    t_high, _ = wavelet_decomposition(target.astype(np.float64))
    _, s_low = wavelet_decomposition(source.astype(np.float64))
    return np.clip(t_high + s_low, 0, 1).astype(np.float32)
