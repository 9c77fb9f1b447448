"""Oracle-parity for the degradation synthesis stack (VERDICT r2 missing #1).

Executes the reference's OWN basicsr/data/degradations.py +
utils/img_process_util.py from /root/reference on CPU torch and asserts
numeric equality against both the host pipeline
(data/realesr_degradation.py) and the on-device primitives
(ops/degrade_jax.py, ops/img_process.py):

- blur-kernel families bit-equal at fixed parameters (:84-175, :389)
- Gaussian/Poisson noise equal given injected draws (:492-556, :609-730),
  incl. the shared-gray-field broadcasting quirk and the rounded-base
  Poisson semantics
- filter2D / USMSharp (:7-84)
- F.interpolate area/bilinear/bicubic vs the band-matrix resizes
"""

import sys
from os import path as osp

import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from ref_loader import ref_module  # noqa: E402

from ssl_tpu.data import degradations as ours  # noqa: E402
from ssl_tpu.data.realesr_degradation import (  # noqa: E402
    apply_gaussian_noise_batch, apply_poisson_noise_batch, filter2d_np,
    usm_sharp_np, _resize)
from ssl_tpu.ops import degrade_jax as dj  # noqa: E402
from ssl_tpu.ops.img_process import filter2d, usm_sharp  # noqa: E402
from ssl_tpu.ops.torch_resize import torch_resize_np  # noqa: E402

pytestmark = pytest.mark.slow


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _nhwc(t):
    return t.numpy().transpose(0, 2, 3, 1)


# --------------------------------------------------------------- blur kernels
@pytest.mark.parametrize("ksize", [7, 13, 21])
def test_bivariate_gaussian_kernels_bit_equal(ksize):
    ref = ref_module("basicsr.data.degradations")
    for iso in (True, False):
        want = ref.bivariate_Gaussian(ksize, 2.3, 1.1, 0.7, isotropic=iso)
        got = ours.bivariate_gaussian(ksize, 2.3, 1.1, 0.7, isotropic=iso)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("beta", [0.5, 1.0, 2.0, 4.0])
def test_generalized_gaussian_and_plateau_bit_equal(beta):
    ref = ref_module("basicsr.data.degradations")
    for iso in (True, False):
        want = ref.bivariate_generalized_Gaussian(15, 1.8, 0.9, -0.3, beta, isotropic=iso)
        got = ours.bivariate_generalized_gaussian(15, 1.8, 0.9, -0.3, beta, isotropic=iso)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)
        want = ref.bivariate_plateau(15, 1.8, 0.9, -0.3, beta, isotropic=iso)
        got = ours.bivariate_plateau(15, 1.8, 0.9, -0.3, beta, isotropic=iso)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("cutoff,ksize,pad_to", [(np.pi / 3, 13, 21), (2.5, 21, 0), (np.pi, 7, 21)])
def test_circular_lowpass_kernel_bit_equal(cutoff, ksize, pad_to):
    ref = ref_module("basicsr.data.degradations")
    want = ref.circular_lowpass_kernel(cutoff, ksize, pad_to=pad_to)
    got = ours.circular_lowpass_kernel(cutoff, ksize, pad_to=pad_to)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)


# -------------------------------------------------------------------- resizes
@pytest.mark.parametrize("mode", ["area", "bilinear", "bicubic"])
@pytest.mark.parametrize("size", [(12, 18), (37, 23), (64, 64)])
def test_resize_matches_f_interpolate(mode, size):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    kwargs = {} if mode == "area" else {"align_corners": False}
    want = _nhwc(torch.nn.functional.interpolate(_nchw(x), size=size, mode=mode, **kwargs))
    got_host = np.stack([torch_resize_np(x[i], size, mode) for i in range(2)])
    np.testing.assert_allclose(got_host, want, rtol=1e-4, atol=1e-5)
    from ssl_tpu.ops.torch_resize import interp_torch
    got_dev = np.asarray(interp_torch(jnp.asarray(x), size, mode))
    np.testing.assert_allclose(got_dev, want, rtol=1e-4, atol=1e-5)


def test_resize_scale_factor_floor_semantics():
    # F.interpolate(scale_factor=s) -> floor(dim*s); host _resize must agree
    rng = np.random.default_rng(1)
    x = rng.random((1, 30, 46, 3)).astype(np.float32)
    for s in (0.37, 1.43):
        want = _nhwc(torch.nn.functional.interpolate(
            _nchw(x), scale_factor=s, mode="bilinear", align_corners=False,
            recompute_scale_factor=False))
        got = _resize(x[0], s, "bilinear")[None]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------- filter2D / USM
def test_filter2d_matches_reference():
    ref = ref_module("basicsr.utils.img_process_util")
    rng = np.random.default_rng(2)
    x = rng.random((2, 20, 24, 3)).astype(np.float32)
    k = rng.random((2, 9, 9)).astype(np.float32)
    k /= k.sum(axis=(1, 2), keepdims=True)
    want = _nhwc(ref.filter2D(_nchw(x), torch.from_numpy(k)))
    got_dev = np.asarray(filter2d(jnp.asarray(x), jnp.asarray(k)))
    np.testing.assert_allclose(got_dev, want, rtol=1e-5, atol=1e-6)
    got_host = np.stack([filter2d_np(x[i], k[i]) for i in range(2)])
    np.testing.assert_allclose(got_host, want, rtol=1e-5, atol=1e-5)


def test_usm_sharp_matches_reference():
    ref = ref_module("basicsr.utils.img_process_util")
    sharp_ref = ref.USMSharp()
    rng = np.random.default_rng(3)
    x = np.clip(rng.random((2, 64, 64, 3)), 0, 1).astype(np.float32)
    want = _nhwc(sharp_ref(_nchw(x)))
    got_dev = np.asarray(usm_sharp(jnp.asarray(x)))
    np.testing.assert_allclose(got_dev, want, rtol=1e-4, atol=1e-5)
    got_host = np.stack([usm_sharp_np(x[i]) for i in range(2)])
    np.testing.assert_allclose(got_host, want, rtol=1e-4, atol=2e-5)


# ------------------------------------------------------ noise (injected draws)
class _Queue:
    def __init__(self):
        self.items = []

    def push(self, *vals):
        self.items.extend(vals)

    def pop(self):
        return self.items.pop(0)


def test_gaussian_noise_pt_matches_given_draws(monkeypatch):
    """random_add_gaussian_noise_pt with torch.rand/randn monkeypatched to
    scripted values == our apply_gaussian_noise_batch on the same values."""
    ref = ref_module("basicsr.data.degradations")
    rng = np.random.default_rng(4)
    b, h, w = 3, 12, 14
    x = np.clip(rng.random((b, h, w, 3)), 0, 1).astype(np.float32)
    sigma_range = (1.0, 30.0)
    gray_prob = 0.4
    u_sigma = np.array([0.1, 0.5, 0.9], np.float32)
    u_gray = np.array([0.05, 0.9, 0.2], np.float32)   # items 0,2 gray
    n_color = rng.standard_normal((b, 3, h, w)).astype(np.float32)
    n_gray = rng.standard_normal((h, w)).astype(np.float32)

    q = _Queue()
    q.push(torch.from_numpy(u_sigma), torch.from_numpy(u_gray))
    rq = _Queue()
    rq.push(torch.from_numpy(n_gray), torch.from_numpy(n_color))
    monkeypatch.setattr(torch, "rand", lambda *a, **k: q.pop())
    monkeypatch.setattr(torch, "randn", lambda *a, **k: rq.pop())
    want = _nhwc(ref.random_add_gaussian_noise_pt(
        _nchw(x), sigma_range=sigma_range, gray_prob=gray_prob, clip=True, rounds=False))

    sigma = u_sigma * (sigma_range[1] - sigma_range[0]) + sigma_range[0]
    gray = (u_gray < gray_prob).astype(np.float32)
    got = apply_gaussian_noise_batch(
        x, sigma, gray, n_color.transpose(0, 2, 3, 1), n_gray)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # device twin (same pure formula, jnp)
    got_dev = np.asarray(dj.apply_gaussian_noise_jax(
        jnp.asarray(x), jnp.asarray(sigma).reshape(-1, 1, 1, 1),
        jnp.asarray(gray).reshape(-1, 1, 1, 1),
        jnp.asarray(n_color.transpose(0, 2, 3, 1)),
        jnp.asarray(n_gray)[None, :, :, None]))
    np.testing.assert_allclose(got_dev, want, rtol=1e-6, atol=1e-6)


def test_poisson_noise_pt_matches_given_draws(monkeypatch):
    """random_add_poisson_noise_pt with torch.rand/torch.poisson monkeypatched
    to deterministic functions == our apply_poisson_noise_batch with the same
    deterministic poisson_fn — pins the rounded-base semantics, per-image
    vals, and grayscale coefficients."""
    ref = ref_module("basicsr.data.degradations")
    rng = np.random.default_rng(5)
    b, h, w = 2, 16, 16
    # quantized image so unique-level counts are interesting
    x = (rng.integers(0, 40, (b, h, w, 3)) * 6 / 255.0).astype(np.float32)
    scale_range = (0.05, 3.0)
    gray_prob = 0.4
    u_scale = np.array([0.3, 0.8], np.float32)
    u_gray = np.array([0.0, 0.99], np.float32)  # item 0 gray

    q = _Queue()
    q.push(torch.from_numpy(u_scale), torch.from_numpy(u_gray))
    monkeypatch.setattr(torch, "rand", lambda *a, **k: q.pop())
    # deterministic "poisson": floor(lam) + (frac(lam) > 0.5)
    monkeypatch.setattr(torch, "poisson", lambda lam: torch.floor(lam) + (lam - torch.floor(lam) > 0.5).float())
    want = _nhwc(ref.random_add_poisson_noise_pt(
        _nchw(x), scale_range=scale_range, gray_prob=gray_prob, clip=True, rounds=False))

    scale = u_scale * (scale_range[1] - scale_range[0]) + scale_range[0]
    gray = (u_gray < gray_prob).astype(np.float32)

    def det_poisson(lam):
        return np.floor(lam) + (lam - np.floor(lam) > 0.5)

    got = apply_poisson_noise_batch(x, scale, gray, poisson_fn=det_poisson)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_poisson_vals_match_reference_unique_count():
    """Per-image vals (2^ceil(log2(unique levels))) — bincount == torch.unique."""
    ref = ref_module("basicsr.data.degradations")
    rng = np.random.default_rng(6)
    x = np.clip(rng.random((2, 24, 24, 3)), 0, 1).astype(np.float32)
    t = torch.clamp((_nchw(x) * 255.0).round(), 0, 255) / 255.0
    want = [2 ** np.ceil(np.log2(len(torch.unique(t[i])))) for i in range(2)]
    from ssl_tpu.data.realesr_degradation import _poisson_vals, _round_uint8_grid
    got = [_poisson_vals(_round_uint8_grid(x[i])) for i in range(2)]
    assert got == want
    got_dev = np.asarray(dj._poisson_vals(dj._round_uint8_grid(jnp.asarray(x)))).reshape(-1)
    np.testing.assert_array_equal(got_dev, np.asarray(want, np.float32))


# ------------------------------------------------- end-to-end feed_data parity
def test_feed_data_end_to_end_frozen_randomness(monkeypatch):
    """Run the reference's OWN RealESRGANSSLModel.feed_data (duck-typed self,
    every random draw scripted) and our degrade_batch with the identical
    frozen plan — the full two-stage chain (blur -> torch-resize -> noise ->
    DiffJPEG -> blur2 -> resize -> noise -> jpeg/sinc order -> uint8 round)
    must agree elementwise (VERDICT r2 next-round #1d)."""
    import random as pyrandom
    import types

    ref_model_mod = ref_module("basicsr.models.realesrganssl_model")
    ref_dj = ref_module("basicsr.utils.diffjpeg")

    from ssl_tpu.data.realesrgan_dataset import _KernelSynth
    from ssl_tpu.data.realesr_degradation import RealESRGANDegrader

    rng = np.random.default_rng(7)
    b, H = 2, 64
    net_scale = 4
    gt = np.clip(rng.random((b, H, H, 3)), 0, 1).astype(np.float32)
    mask = (rng.random((b, H, H, 1)) < 0.25).astype(np.float32)
    synth = _KernelSynth({})
    ks = [synth.sample() for _ in range(b)]
    k1 = np.stack([k[0] for k in ks]).astype(np.float32)
    k2 = np.stack([k[1] for k in ks]).astype(np.float32)
    sinc = np.stack([k[2] for k in ks]).astype(np.float32)

    # ---- the frozen plan (all decisions chosen here, injected on BOTH sides)
    mode1, mode2, final_mode = "bicubic", "area", "bilinear"
    scale1, scale2 = 0.5, 1.15
    sigma1 = np.array([12.0, 25.0], np.float32)       # stage1: gaussian
    gray1 = np.array([1.0, 0.0], np.float32)
    h1 = int(H * scale1)
    n_color1 = rng.standard_normal((b, 3, h1, h1)).astype(np.float32)
    n_gray1 = rng.standard_normal((h1, h1)).astype(np.float32)
    q1 = np.array([45.0, 80.0], np.float32)
    pscale2 = np.array([1.4, 0.3], np.float32)        # stage2: poisson
    gray2 = np.array([0.0, 1.0], np.float32)
    q2 = np.array([88.0, 35.0], np.float32)
    sinc_first = True
    second_blur = True

    def det_poisson_np(lam):
        return np.floor(lam) + (lam - np.floor(lam) > 0.5)

    # ---- reference side: scripted randomness
    nr = (1, 30)
    pr = (0.05, 3)
    opt = {
        "degradation_order": "two", "scale": net_scale, "Use_sharpen": None,
        "resize_prob": [0.2, 0.7, 0.1], "resize_range": [0.15, 1.5],
        "gaussian_noise_prob": 0.5, "noise_range": list(nr),
        "poisson_scale_range": list(pr), "gray_noise_prob": 0.4,
        "jpeg_range": [30, 95],
        "second_blur_prob": 0.8, "resize_prob2": [0.3, 0.4, 0.3],
        "resize_range2": [0.3, 1.2], "gaussian_noise_prob2": 0.5,
        "noise_range2": list(nr), "poisson_scale_range2": list(pr),
        "gray_noise_prob2": 0.4, "jpeg_range2": [30, 95],
        "datasets": {"train": {"gt_size": H}},
    }
    np_uniform_q = [
        0.1,              # < gaussian_noise_prob -> gaussian (stage 1)
        0.5,              # < second_blur_prob -> blur2
        0.9,              # >= gaussian_noise_prob2 -> poisson (stage 2)
        0.2,              # < 0.5 -> sinc_first branch
    ]
    np_uniform_ranged_q = [scale1, scale2]
    choices_q = [["down"], ["up"]]
    choice_q = [mode1, mode2, final_mode]
    torch_rand_q = [
        torch.from_numpy((sigma1 - nr[0]) / (nr[1] - nr[0])),
        torch.from_numpy(np.where(gray1 > 0, 0.0, 0.99).astype(np.float32)),
        torch.from_numpy((pscale2 - pr[0]) / (pr[1] - pr[0])),
        torch.from_numpy(np.where(gray2 > 0, 0.0, 0.99).astype(np.float32)),
    ]
    torch_randn_q = [torch.from_numpy(n_gray1), torch.from_numpy(n_color1)]
    uniform_q = [torch.from_numpy(q1), torch.from_numpy(q2)]

    def fake_np_uniform(*args, **kw):
        if len(args) >= 2:
            return np_uniform_ranged_q.pop(0)
        return np_uniform_q.pop(0)

    monkeypatch.setattr(ref_model_mod.np.random, "uniform", fake_np_uniform)
    monkeypatch.setattr(pyrandom, "choices", lambda *a, **k: choices_q.pop(0))
    monkeypatch.setattr(pyrandom, "choice", lambda *a, **k: choice_q.pop(0))
    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch_rand_q.pop(0))
    monkeypatch.setattr(torch, "randn", lambda *a, **k: torch_randn_q.pop(0))
    monkeypatch.setattr(torch, "poisson",
                        lambda lam: torch.from_numpy(
                            det_poisson_np(lam.numpy()).astype(np.float32)))

    def fake_uniform_(self_t, lo, hi):
        self_t.copy_(uniform_q.pop(0))
        return self_t

    monkeypatch.setattr(torch.Tensor, "uniform_", fake_uniform_)

    # the reference filter2D does img.view(1, b*c, ...) which requires a
    # contiguous tensor; on CPU the DiffJPEG output is non-contiguous, so
    # route through .contiguous() (identical values)
    real_filter2d = ref_model_mod.filter2D
    monkeypatch.setattr(ref_model_mod, "filter2D",
                        lambda img, k: real_filter2d(img.contiguous(), k))

    duck = types.SimpleNamespace(
        opt=opt, device=torch.device("cpu"),
        jpeger=ref_dj.DiffJPEG(differentiable=False),
        _dequeue_and_enqueue=lambda: None,
    )
    data = {
        "gt": _nchw(gt), "gt_mask": _nchw(mask),
        "kernel1": torch.from_numpy(k1), "kernel2": torch.from_numpy(k2),
        "sinc_kernel": torch.from_numpy(sinc),
    }
    ref_model_mod.RealESRGANSSLModel.feed_data(duck, data)
    want_lq = _nhwc(duck.lq)
    assert not np_uniform_q and not choices_q and not choice_q \
        and not torch_rand_q and not torch_randn_q and not uniform_q

    # ---- our side: same plan, explicit
    degrader = RealESRGANDegrader({}, scale=net_scale, queue_size=0, seed=0)
    plan = {
        "scale1": scale1, "mode1": mode1,
        "noise1": {"use_gauss": True, "level": sigma1, "gray": gray1,
                   "normals": n_color1.transpose(0, 2, 3, 1),
                   "normals_gray": n_gray1, "poisson": None},
        "jpeg_q1": q1,
        "second_blur": second_blur,
        "scale2": scale2, "mode2": mode2,
        "noise2": {"use_gauss": False, "level": pscale2, "gray": gray2,
                   "normals": None, "normals_gray": None,
                   "poisson": det_poisson_np},
        "sinc_first": sinc_first, "final_mode": final_mode, "jpeg_q2": q2,
    }
    got_lq = degrader.degrade_batch(gt, k1, k2, sinc, plan=plan)

    assert got_lq.shape == want_lq.shape
    # both sides end uint8-rounded; tolerate 1-level flips at quantization
    # boundaries from float-order differences
    diff_levels = np.abs(got_lq - want_lq) * 255.0
    assert (diff_levels <= 1.0 + 1e-3).all(), diff_levels.max()
    assert (diff_levels > 0.5).mean() < 0.01
