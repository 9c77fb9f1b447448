"""Metric tests: PSNR/SSIM known values, NIQE fit+score ordering, FID math."""
import os

import numpy as np
import pytest

from ssl_tpu.metrics import calculate_metric
from ssl_tpu.metrics.psnr_ssim import calculate_psnr, calculate_ssim


def test_psnr_known_values():
    a = np.full((32, 32, 3), 100.0)
    b = np.full((32, 32, 3), 110.0)  # mse=100 -> psnr = 10*log10(255^2/100)
    p = calculate_psnr(a, b)
    assert abs(p - 10 * np.log10(255.0 ** 2 / 100.0)) < 1e-6
    assert calculate_psnr(a, a) == float("inf")


def test_ssim_identity_and_degradation():
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.float64)
    assert calculate_ssim(img, img) > 0.9999
    noisy = np.clip(img + rng.randn(64, 64, 3) * 25, 0, 255)
    s = calculate_ssim(img, noisy)
    assert 0 < s < 0.95


def test_metric_dispatcher():
    a = np.full((16, 16, 3), 100.0)
    b = np.full((16, 16, 3), 110.0)
    val = calculate_metric({"img": a, "img2": b},
                           {"type": "calculate_psnr", "crop_border": 0, "better": "higher"})
    assert np.isfinite(val)


def test_niqe_fit_and_ordering(tmp_path):
    """Fit pristine params from smooth natural-ish images; heavily degraded
    images must score worse (higher NIQE)."""
    import cv2
    from ssl_tpu.metrics.niqe import calculate_niqe, fit_niqe_params
    rng = np.random.RandomState(0)
    folder = str(tmp_path / "pristine")
    os.makedirs(folder)
    for i in range(4):
        # structured image: smooth gradients + texture
        yy, xx = np.mgrid[0:224, 0:224] / 224.0
        img = (np.stack([np.sin(8 * yy + i) * 0.4 + 0.5,
                         xx * 0.8, (yy + xx) / 2], -1) * 255)
        img += rng.randn(224, 224, 3) * 8
        cv2.imwrite(os.path.join(folder, f"p{i}.png"), np.clip(img, 0, 255).astype(np.uint8))
    params_path = str(tmp_path / "pris.npz")
    fit_niqe_params(folder, params_path)

    yy, xx = np.mgrid[0:224, 0:224] / 224.0
    clean = (np.stack([np.sin(8 * yy) * 0.4 + 0.5, xx * 0.8, (yy + xx) / 2], -1) * 255)
    clean = np.clip(clean + rng.randn(224, 224, 3) * 8, 0, 255)
    degraded = np.clip(clean + rng.randn(224, 224, 3) * 60, 0, 255)
    s_clean = calculate_niqe(clean, pris_params_path=params_path)
    s_degraded = calculate_niqe(degraded, pris_params_path=params_path)
    assert np.isfinite(s_clean) and np.isfinite(s_degraded)
    assert s_degraded > s_clean


def test_fid_math():
    from ssl_tpu.metrics.fid import calculate_fid_from_stats, stats_from_features
    rng = np.random.RandomState(0)
    f1 = rng.randn(200, 16)
    f2 = rng.randn(200, 16)
    mu1, s1 = stats_from_features(f1)
    mu2, s2 = stats_from_features(f2)
    same = calculate_fid_from_stats(mu1, s1, mu1, s1)
    diff = calculate_fid_from_stats(mu1, s1, mu2 + 3.0, s2)
    assert abs(same) < 1e-6
    assert diff > 100


def test_dists_arch_scoring():
    import jax
    import jax.numpy as jnp
    from ssl_tpu.metrics.dists_metric import DISTS
    m = DISTS()
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    y = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x, y)
    assert abs(float(m.apply(v, x, x)[0])) < 1e-4  # identical -> distance 0
    assert float(m.apply(v, x, y)[0]) > 0.1
