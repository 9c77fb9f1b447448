"""SSL loss tests: dense-vs-gather parity, reduction semantics, gradients."""
import numpy as np
import jax
import jax.numpy as jnp

from ssl_tpu.losses.ssl_loss import SSLSetting, ssl_loss
from ssl_tpu.ops.ssg import SSGConfig


def _data(b=2, h=20, w=20, seed=0):
    rng = np.random.RandomState(seed)
    sr = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    mask = jnp.asarray(rng.rand(b, h, w, 1) < 0.2, jnp.float32)
    return sr, gt, mask


def test_dense_matches_gather_impl():
    sr, gt, mask = _data()
    cfg = SSGConfig(search=9, window=5)
    dense = SSLSetting(ssg=cfg, capacity=512, impl="dense")
    gather = SSLSetting(ssg=cfg, capacity=512, impl="scan")
    l1_d, kl_d = ssl_loss(sr, gt, mask, dense)
    l1_g, kl_g = ssl_loss(sr, gt, mask, gather)
    assert abs(float(l1_d) - float(l1_g)) / (abs(float(l1_g)) + 1e-12) < 1e-4
    assert abs(float(kl_d) - float(kl_g)) / (abs(float(kl_g)) + 1e-12) < 1e-4


def test_identical_images_zero_loss():
    sr, gt, mask = _data()
    s = SSLSetting(ssg=SSGConfig(search=9, window=5), impl="dense")
    l1, kl = ssl_loss(gt, gt, mask, s)
    assert abs(float(l1)) < 1e-6
    assert abs(float(kl)) < 1e-6


def test_empty_mask_zero_loss():
    sr, gt, _ = _data()
    mask = jnp.zeros(sr.shape[:3] + (1,))
    s = SSLSetting(ssg=SSGConfig(search=9, window=5), impl="dense")
    l1, kl = ssl_loss(sr, gt, mask, s)
    assert float(l1) == 0.0 and float(kl) == 0.0


def test_dense_grad_flows_only_through_sr():
    sr, gt, mask = _data(b=1, h=16, w=16)
    s = SSLSetting(ssg=SSGConfig(search=7, window=3), impl="dense",
                   l1_weight=1.0, kl_weight=1.0)

    def loss(x):
        l1, kl = ssl_loss(x, gt, mask, s)
        return l1 + kl

    g = jax.grad(loss)(sr)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0

    def loss_gt(y):
        l1, kl = ssl_loss(sr, y, mask, s)
        return l1 + kl

    g2 = jax.grad(loss_gt)(gt)
    assert float(jnp.abs(g2).max()) == 0.0  # gt branch stop-gradiented


def test_mask_stride_reduces_count():
    sr, gt, mask = _data()
    cfg = SSGConfig(search=9, window=5)
    on = SSLSetting(ssg=cfg, impl="dense", mask_stride=3)
    off = SSLSetting(ssg=cfg, impl="dense", mask_stride=0)
    l1_on, _ = ssl_loss(sr, gt, mask, on)
    l1_off, _ = ssl_loss(sr, gt, mask, off)
    # different pixel subsets -> different (but finite) losses
    assert np.isfinite(float(l1_on)) and np.isfinite(float(l1_off))
