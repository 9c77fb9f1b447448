"""Back-projection post-processing (scripts/data_preparation/back_projection.py)
vs the reference matlab pack (scripts/matlab_scripts/back_projection/*.m)."""
import numpy as np

from scripts.data_preparation.back_projection import (
    backprojection, fspecial_gaussian, reverse_filter)
from ssl_tpu.utils.matlab_resize import imresize


def test_fspecial_gaussian_matches_matlab():
    p = fspecial_gaussian(5, 1.0)
    assert p.shape == (5, 5)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-12)
    # fspecial('gaussian',5,1) well-known entries (matlab doc values)
    np.testing.assert_allclose(p[2, 2], 0.162103, atol=1e-6)
    np.testing.assert_allclose(p[0, 0], 0.002969, atol=1e-6)
    np.testing.assert_allclose(p[2, 1], 0.098320, atol=1e-6)
    assert np.allclose(p, p.T)  # symmetric -> conv2 == correlate


def _fixtures(scale=4, hw=32):
    rng = np.random.RandomState(0)
    gt = rng.rand(hw, hw, 3)
    im_l = imresize(gt, 1.0 / scale)
    # a degraded SR output: bicubic upsample + noise
    im_h = np.clip(imresize(im_l, float(scale)) + 0.05 * rng.randn(hw, hw, 3), 0, 1)
    return im_h, im_l


def test_backprojection_improves_lr_consistency():
    im_h, im_l = _fixtures()
    out = backprojection(im_h, im_l, scale=4, max_iter=20)
    err0 = np.abs(imresize(im_h, 0.25) - im_l).mean()
    err1 = np.abs(imresize(out, 0.25) - im_l).mean()
    assert err1 < 0.5 * err0
    assert np.isfinite(out).all()


def test_reverse_filter_improves_lr_consistency():
    im_h, im_l = _fixtures()
    out = reverse_filter(im_h, im_l, scale=4, max_iter=20)
    err0 = np.abs(imresize(im_h, 0.25) - im_l).mean()
    err1 = np.abs(imresize(out, 0.25) - im_l).mean()
    assert err1 < 0.5 * err0
    assert np.isfinite(out).all()


def test_backprojection_fixed_point_on_consistent_input():
    """If down(im_h) already equals im_l, one bp step is (near) identity."""
    rng = np.random.RandomState(1)
    gt = rng.rand(32, 32, 3)
    im_l = imresize(gt, 0.25)
    out = backprojection(gt, im_l, scale=4, max_iter=1)
    np.testing.assert_allclose(out, gt, atol=1e-12)
