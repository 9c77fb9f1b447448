"""Sampler tests: DDIM + spaced DDPM shapes/finiteness, tiled canvas blending."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from ssl_tpu.diffusion.sampler import (ddim_sample, gaussian_tile_weights,
                                       spaced_ddpm_sample, tiled_sample)
from ssl_tpu.diffusion.schedules import build_schedule_arrays, make_beta_schedule

pytestmark = pytest.mark.slow


def _fake_model(x, t, context, z_lq):
    # pseudo eps model: pull toward z_lq
    return (x - z_lq) * 0.1


def test_ddim_and_spaced_shapes():
    sched = build_schedule_arrays(make_beta_schedule("linear", 100))
    rng = jax.random.PRNGKey(0)
    z_lq = jnp.zeros((1, 8, 8, 4))
    out = ddim_sample(_fake_model, sched, (1, 8, 8, 4), rng, None, z_lq, steps=10)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    out2 = spaced_ddpm_sample(_fake_model, sched, (1, 8, 8, 4), rng, None, z_lq, steps=10)
    assert out2.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out2)).all()


def test_gaussian_tile_weights():
    w = gaussian_tile_weights(16)
    assert w.shape == (16, 16)
    assert abs(w.max() - 1.0) < 1e-6
    assert w[0, 0] < w[8, 8]


def test_tiled_sample_blending():
    z_lq = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 4), np.float32)

    def sample_fn(z_tile):
        return z_tile * 2.0  # deterministic per-tile op

    out = tiled_sample(sample_fn, z_lq, tile=8, overlap=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(z_lq) * 2.0, rtol=1e-5)


def test_tiled_sample_data_parallel_matches_serial():
    """data_parallel=True (tiles sharded one-per-device over the 8-CPU mesh)
    equals the serial canvas for a deterministic sample_fn."""
    z_lq = jnp.asarray(np.random.RandomState(1).rand(2, 24, 24, 4), np.float32)

    def sample_fn(z_tile):
        return z_tile * 3.0 - 0.5

    serial = tiled_sample(sample_fn, z_lq, tile=8, overlap=4)
    par = tiled_sample(sample_fn, z_lq, tile=8, overlap=4, data_parallel=True)
    np.testing.assert_allclose(np.asarray(par), np.asarray(serial), rtol=1e-6)


def test_plms_matches_ddim_ode_limit():
    """PLMS (4th-order multistep on eps) and DDIM (1st order) integrate the
    same probability-flow ODE: PLMS at 30 steps should land near DDIM at 400
    steps, and much nearer than DDIM at 30 steps is to its own limit."""
    from ssl_tpu.diffusion.sampler import plms_sample
    sched = build_schedule_arrays(make_beta_schedule("linear", 1000))
    rng = jax.random.PRNGKey(1)
    z_lq = jnp.asarray(np.random.RandomState(3).rand(1, 6, 6, 4), np.float32)

    ref = np.asarray(ddim_sample(_fake_model, sched, (1, 6, 6, 4), rng, None,
                                 z_lq, steps=400))
    plms = np.asarray(plms_sample(_fake_model, sched, (1, 6, 6, 4), rng, None,
                                  z_lq, steps=30))
    ddim30 = np.asarray(ddim_sample(_fake_model, sched, (1, 6, 6, 4), rng,
                                    None, z_lq, steps=30))
    assert np.isfinite(plms).all()
    err_plms = np.abs(plms - ref).max()
    err_ddim30 = np.abs(ddim30 - ref).max()
    assert err_plms < err_ddim30, (err_plms, err_ddim30)
    assert err_plms < 0.05 * np.abs(ref).max() + 1e-3
