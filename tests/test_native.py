"""Native C++ pipeline kernels: build, and parity with numpy/JAX paths."""
import numpy as np
import pytest

from ssl_tpu import native


needs_native = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


@needs_native
def test_native_jpeg_matches_numpy():
    from ssl_tpu.data.realesr_degradation import jpeg_np
    rng = np.random.RandomState(0)
    img = rng.rand(48, 40, 3).astype(np.float32)
    out_c = native.jpeg_roundtrip(img, 75.0)
    out_np = jpeg_np(img, 75.0)
    assert np.abs(out_c - out_np).max() < 2e-3


@needs_native
def test_native_jpeg_batch_threads():
    rng = np.random.RandomState(1)
    imgs = rng.rand(4, 32, 32, 3).astype(np.float32)
    out = native.jpeg_roundtrip_batch(imgs, [30, 50, 75, 95], n_threads=4)
    assert out.shape == imgs.shape
    errs = [np.abs(out[i] - imgs[i]).mean() for i in range(4)]
    assert errs[0] > errs[3]  # lower quality -> more error


@needs_native
def test_native_filter2d_matches_cv2():
    from ssl_tpu.data.realesr_degradation import filter2d_np
    rng = np.random.RandomState(2)
    img = rng.rand(33, 37, 3).astype(np.float32)
    k = rng.rand(5, 5).astype(np.float32)
    k /= k.sum()
    out_c = native.filter2d(img, k)
    out_cv = filter2d_np(img, k)
    assert np.abs(out_c - out_cv).max() < 1e-5


@needs_native
def test_native_ssg_golden_matches_jax():
    import jax.numpy as jnp
    from ssl_tpu.ops.ssg import SSGConfig, mask_to_positions, ssg_ssd_maps_scan
    rng = np.random.RandomState(3)
    h = w = 20
    img = rng.rand(3, h, w).astype(np.float32)
    mask = (rng.rand(h, w) < 0.1).astype(np.float32)
    cfg = SSGConfig(search=9, window=5)
    pos, valid, _ = mask_to_positions(jnp.asarray(mask), 32)
    ssd_jax = np.asarray(ssg_ssd_maps_scan(jnp.asarray(img), cfg, pos))
    p = cfg.search // 2
    img_pad = np.pad(img, ((0, 0), (p, p), (p, p)), mode="reflect")
    pos_np = np.asarray(pos) + p
    ssd_c = native.ssg_golden(img_pad, pos_np, cfg.search, cfg.window)
    ssd_c = ssd_c.reshape(ssd_c.shape[0], -1)
    v = np.asarray(valid)
    rel = np.abs(ssd_c[v] - ssd_jax[v]) / (np.abs(ssd_jax[v]) + 1e-6)
    assert rel.max() < 1e-4
