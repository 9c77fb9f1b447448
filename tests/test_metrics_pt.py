"""Oracle-parity for the batched on-device PSNR/SSIM variants (reference:
GAN-Based-SR/basicsr/metrics/psnr_ssim.py:52-81 calculate_psnr_pt,
:132-166 calculate_ssim_pt — executed as torch oracles)."""

import numpy as np
import pytest
import torch

from ref_loader import ref_module

from ssl_tpu.metrics.psnr_ssim import calculate_psnr_pt, calculate_ssim_pt


@pytest.fixture(scope="module")
def ref_psnr_ssim():
    return ref_module("basicsr.metrics.psnr_ssim")


def _pair(seed=0, n=3, c=3, h=48, w=40):
    rng = np.random.RandomState(seed)
    a = rng.rand(n, c, h, w).astype(np.float32)
    b = np.clip(a + rng.randn(n, c, h, w).astype(np.float32) * 0.05, 0, 1)
    return a, b


@pytest.mark.parametrize("crop,ych", [(0, False), (4, False), (4, True)])
def test_psnr_pt_oracle(ref_psnr_ssim, crop, ych):
    a, b = _pair()
    ref = ref_psnr_ssim.calculate_psnr_pt(
        torch.from_numpy(a), torch.from_numpy(b), crop_border=crop,
        test_y_channel=ych).numpy()
    ours = np.asarray(calculate_psnr_pt(a, b, crop_border=crop,
                                        test_y_channel=ych))
    assert ours.shape == (3,)
    np.testing.assert_allclose(ours, ref, atol=1e-3)  # fp32 vs fp64


@pytest.mark.parametrize("crop,ych", [(0, False), (4, False), (4, True)])
def test_ssim_pt_oracle(ref_psnr_ssim, crop, ych):
    a, b = _pair(seed=1)
    ref = ref_psnr_ssim.calculate_ssim_pt(
        torch.from_numpy(a), torch.from_numpy(b), crop_border=crop,
        test_y_channel=ych).numpy()
    ours = np.asarray(calculate_ssim_pt(a, b, crop_border=crop,
                                        test_y_channel=ych))
    assert ours.shape == (3,)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_pt_metrics_registered():
    from ssl_tpu.utils.registry import METRIC_REGISTRY
    assert "calculate_psnr_pt" in METRIC_REGISTRY
    assert "calculate_ssim_pt" in METRIC_REGISTRY


def test_psnr_pt_jittable():
    import jax
    a, b = _pair(seed=2, n=2, h=24, w=24)
    fn = jax.jit(lambda x, y: (calculate_psnr_pt(x, y, crop_border=2),
                               calculate_ssim_pt(x, y, crop_border=2)))
    p, s = fn(a, b)
    assert np.isfinite(np.asarray(p)).all() and np.isfinite(np.asarray(s)).all()
