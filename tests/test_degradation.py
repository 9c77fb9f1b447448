"""Degradation pipeline tests: kernels, noise, JPEG, queue, full pipeline."""
import numpy as np
import pytest

from ssl_tpu.data.degradations import (
    bivariate_gaussian, circular_lowpass_kernel, random_mixed_kernels,
)
from ssl_tpu.data.realesr_degradation import (
    RealESRGANDegrader, TrainingPairPool, jpeg_np, usm_sharp_np,
)
from ssl_tpu.data.realesrgan_dataset import _KernelSynth


def test_kernels_normalized():
    k = bivariate_gaussian(21, 2.0)
    assert abs(k.sum() - 1.0) < 1e-6
    assert k[10, 10] == k.max()
    k2 = random_mixed_kernels(["iso", "aniso"], [0.5, 0.5], 21)
    assert abs(k2.sum() - 1.0) < 1e-6
    sinc = circular_lowpass_kernel(np.pi / 2, 13, pad_to=21)
    assert sinc.shape == (21, 21)
    assert abs(sinc.sum() - 1.0) < 1e-6


def test_kernel_synth_shapes():
    synth = _KernelSynth({})
    k1, k2, sinc = synth.sample()
    assert k1.shape == (21, 21) and k2.shape == (21, 21) and sinc.shape == (21, 21)


def test_jpeg_np_quality_ordering():
    # smooth image (chroma subsampling is lossless-ish there)
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    img = np.stack([yy, xx, (yy + xx) / 2], -1).astype(np.float32)
    hi = jpeg_np(img, 95)
    lo = jpeg_np(img, 10)
    err_hi = np.abs(hi - img).mean()
    err_lo = np.abs(lo - img).mean()
    assert err_hi < err_lo
    assert err_hi < 0.02


def test_diffjpeg_matches_numpy_jpeg():
    import jax.numpy as jnp
    from ssl_tpu.ops.diffjpeg import diff_jpeg
    rng = np.random.RandomState(1)
    img = rng.rand(1, 32, 32, 3).astype(np.float32)
    outj = np.asarray(diff_jpeg(jnp.asarray(img), jnp.asarray([75.0])))[0]
    outn = jpeg_np(img[0], 75.0)
    # jnp path uses the differentiable-round surrogate; bounded deviation
    assert np.abs(outj - outn).mean() < 0.02
    assert np.abs(outj - outn).max() < 0.12


def test_queue_pool_roundtrip():
    pool = TrainingPairPool(queue_size=8)
    outs = []
    for i in range(6):
        batch = {"gt": np.full((2, 4, 4, 3), i, np.float32)}
        outs.append(pool(batch)["gt"][0, 0, 0, 0])
    # first 4 batches pass through while filling; after full, shuffled replay
    assert outs[:4] == [0, 1, 2, 3]
    assert all(0 <= v <= 5 for v in outs)


def test_full_degrader_pipeline():
    degrader = RealESRGANDegrader({}, scale=4, queue_size=0, seed=0)
    degrader.pool = None
    rng = np.random.RandomState(0)
    b = 2
    gt = rng.rand(b, 64, 64, 3).astype(np.float32)
    synth = _KernelSynth({})
    ks = [synth.sample() for _ in range(b)]
    batch = {
        "gt": gt,
        "gt_mask": (rng.rand(b, 64, 64, 1) < 0.3).astype(np.float32),
        "kernel1": np.stack([k[0] for k in ks]),
        "kernel2": np.stack([k[1] for k in ks]),
        "sinc_kernel": np.stack([k[2] for k in ks]),
        "gt_size": 32,
    }
    degrader.gt_size = 32
    out = degrader(batch)
    assert out["gt"].shape == (b, 32, 32, 3)
    assert out["lq"].shape == (b, 8, 8, 3)
    assert out["gt_mask"].shape == (b, 32, 32, 1)
    assert out["lq"].min() >= 0 and out["lq"].max() <= 1
    assert set(np.unique(out["gt_mask"])) <= {0.0, 1.0}


def test_usm_sharp():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 64, 3).astype(np.float32)
    sharp = usm_sharp_np(img)
    assert sharp.shape == img.shape
    assert np.isfinite(sharp).all()
