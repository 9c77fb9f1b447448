"""Oracle-parity for the KAIR BSRGAN degradation chain (VERDICT r2 #1d).

Executes the reference's OWN train_BSGRAN/utils/utils_blindsr.py from
/root/reference with the global random/np.random streams seeded identically
on both sides — our ops consume draws in the reference's exact order, so the
outputs must be bit-equal (per-op AND the full shuffled chain)."""

import random
import sys
import warnings
from os import path as osp

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from ref_loader import ref_module  # noqa: E402

from ssl_tpu.data import bsrgan_degradation as ours  # noqa: E402

pytestmark = pytest.mark.slow


class _Interp2dShim:
    """Legacy scipy interp2d(kind='linear') — removed in scipy>=1.14 (the
    1.17 symbol raises NotImplementedError).  On a regular grid the legacy
    behavior was the bilinear spline (RectBivariateSpline kx=ky=1), which is
    the UNIQUE piecewise-linear interpolant, so this shim is faithful."""

    def __init__(self, x, y, z, kind="linear"):
        from scipy.interpolate import RectBivariateSpline
        self._s = RectBivariateSpline(np.asarray(y), np.asarray(x), z, kx=1, ky=1)

    def __call__(self, xn, yn):
        return self._s(np.asarray(yn), np.asarray(xn))


def _ref():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mod = ref_module("train_BSGRAN.utils.utils_blindsr")
    mod.interp2d = _Interp2dShim
    return mod


def _img(seed=0, h=64, w=64):
    rng = np.random.default_rng(seed)
    return np.clip(rng.random((h, w, 3)), 0, 1).astype(np.float32)


def _seeded(fn, seed):
    random.seed(seed)
    np.random.seed(seed)
    return fn()


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_add_blur_bit_equal(seed):
    ref = _ref()
    x = _img(seed)
    want = _seeded(lambda: ref.add_blur(x.copy(), sf=4), seed)
    got = _seeded(lambda: ours.add_blur(x.copy(), sf=4), seed)
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_add_gaussian_noise_bit_equal(seed):
    ref = _ref()
    x = _img(seed)
    want = _seeded(lambda: ref.add_Gaussian_noise(x.copy(), 1, 12), seed)
    got = _seeded(lambda: ours.add_gaussian_noise_bsr(x.copy(), 1, 12), seed)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_add_speckle_and_poisson_bit_equal(seed):
    ref = _ref()
    x = _img(seed)
    want = _seeded(lambda: ref.add_speckle_noise(x.copy(), 2, 25), seed)
    got = _seeded(lambda: ours.add_speckle_noise(x.copy(), 2, 25), seed)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    want = _seeded(lambda: ref.add_Poisson_noise(x.copy()), seed)
    got = _seeded(lambda: ours.add_poisson_noise_bsr(x.copy()), seed)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_add_jpeg_and_resize_bit_equal(seed):
    ref = _ref()
    x = _img(seed)
    want = _seeded(lambda: ref.add_JPEG_noise(x.copy()), seed)
    got = _seeded(lambda: ours.add_jpeg_noise(x.copy()), seed)
    np.testing.assert_array_equal(got, want)
    want = _seeded(lambda: ref.add_resize(x.copy(), sf=4), seed)
    got = _seeded(lambda: ours.add_resize(x.copy(), sf=4), seed)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_fspecial_and_aniso_kernels_bit_equal():
    ref = _ref()
    for size, sigma in ((3, 0.5), (7, 1.3), (9, 2.7)):
        np.testing.assert_allclose(ours._fspecial_gaussian(size, sigma),
                                   ref.fspecial("gaussian", size, sigma),
                                   rtol=1e-12, atol=1e-15)
    for ksize, theta, l1, l2 in ((3, 0.3, 0.8, 0.2), (7, 2.1, 1.0, 0.9),
                                 (9, 1.0, 0.5, 0.05)):
        np.testing.assert_allclose(
            ours.anisotropic_gaussian_bsr(ksize, theta, l1, l2),
            ref.anisotropic_Gaussian(ksize, theta, l1, l2),
            rtol=1e-9, atol=1e-12)


def test_shift_pixel_bit_equal():
    ref = _ref()
    rng = np.random.default_rng(9)
    k = rng.random((7, 7))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = ref.shift_pixel(k.copy(), 4)
    got = ours.shift_pixel(k.copy(), 4)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
def test_degradation_bsrgan_chain_bit_equal(seed):
    """Full shuffled chain, 10 seeds (covers different op orders, the x2
    pre-downsample both branches, blur families, noise families, JPEG gate)."""
    ref = _ref()
    x = _img(seed, 80, 96)
    want_lq, want_hq = _seeded(lambda: ref.degradation_bsrgan(
        x.copy(), sf=4, lq_patchsize=16), seed)
    got_lq, got_hq = _seeded(lambda: ours.degradation_bsrgan(
        x.copy(), sf=4, lq_patchsize=16), seed)
    np.testing.assert_allclose(got_hq, want_hq, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got_lq, want_lq, rtol=1e-5, atol=1e-6)
