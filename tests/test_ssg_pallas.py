"""Pallas fused SSL-loss kernel: interpret-mode parity + custom_vjp gradient."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from ssl_tpu.ops.ssg import SSGConfig, ssl_loss_dense_batched
from ssl_tpu.ops.ssg_pallas import ssl_loss_sums_pallas

pytestmark = pytest.mark.slow


def _data(b=2, c=3, h=20, w=20, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w] / h
    base = np.stack([np.sin(6 * yy) + np.cos(5 * xx), yy * xx,
                     np.cos(8 * (yy + xx))], 0) * 0.3 + 0.5
    gt = jnp.asarray(np.stack([base * (0.9 + 0.1 * i) for i in range(b)]), jnp.float32)
    sr = gt + jnp.asarray(rng.randn(b, c, h, w) * 0.02, jnp.float32)
    mask = jnp.asarray(rng.rand(b, h, w) < 0.3, jnp.float32)
    return sr, gt, mask


def test_pallas_interpret_matches_dense():
    sr, gt, mask = _data()
    cfg = SSGConfig(search=9, window=5, sigma=0.1)
    l1p, klp, cp = ssl_loss_sums_pallas(sr, gt, mask, cfg, True)
    l1d, kld, cd = ssl_loss_dense_batched(sr, gt, mask, cfg)
    assert float(cp) == float(cd)
    assert abs(float(l1p) - float(l1d)) / (abs(float(l1d)) + 1e-12) < 1e-4
    assert abs(float(klp) - float(kld)) / (abs(float(kld)) + 1e-12) < 1e-3


def test_pallas_custom_vjp_grad():
    sr, gt, mask = _data()
    cfg = SSGConfig(search=7, window=3, sigma=0.1)

    def loss_p(s):
        l1, kl, _ = ssl_loss_sums_pallas(s, gt, mask, cfg, True)
        return l1 + kl

    def loss_d(s):
        l1, kl, _ = ssl_loss_dense_batched(s, gt, mask, cfg)
        return l1 + kl

    gp = jax.grad(loss_p)(sr)
    gd = jax.grad(loss_d)(sr)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gd), rtol=1e-4, atol=1e-7)
