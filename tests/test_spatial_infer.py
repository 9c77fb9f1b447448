"""Spatially-sharded inference (parallel/spatial.py) on the 8-device CPU mesh.

The core property: with halo >= the generator's receptive-field radius the
sharded result equals single-device full-image inference ELEMENTWISE —
including the true image edges (edge shards start at the image boundary so
the net's implicit conv padding applies exactly as in the full pass).
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ssl_tpu.parallel.spatial import create_spatial_mesh, spatial_infer

pytestmark = pytest.mark.slow


def _net(num_feat=8, num_block=1):
    from ssl_tpu.archs import build_network
    net = build_network(dict(type="MSRResNet", num_feat=num_feat,
                             num_block=num_block, upscale=4))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    return (lambda p, x: net.apply({"params": p}, x)), params


def test_spatial_matches_full_image():
    assert len(jax.devices()) == 8
    apply_fn, params = _net()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 256, 16, 3).astype(np.float32))
    full = apply_fn(params, img)
    mesh = create_spatial_mesh()
    out = spatial_infer(apply_fn, params, img, scale=4, mesh=mesh, halo=16)
    assert out.shape == full.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_spatial_non_multiple_height():
    """H not divisible by the mesh: reflect pad internally, crop the output.
    Rows within the receptive field of the internal trailing pad see reflect
    rows instead of the net's implicit zero pad — the SAME approximation
    tile_process makes at trailing tile edges — so exactness is asserted on
    everything above that band."""
    apply_fn, params = _net()
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(1, 250, 16, 3).astype(np.float32))
    full = apply_fn(params, img)
    out = spatial_infer(apply_fn, params, img, scale=4,
                        mesh=create_spatial_mesh(), halo=16)
    assert out.shape == (1, 1000, 64, 3)
    interior = (250 - 16) * 4
    np.testing.assert_allclose(np.asarray(out)[:, :interior],
                               np.asarray(full)[:, :interior],
                               rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(out)).all()


def test_spatial_small_image_fallback():
    """Images too small to shard profitably run single-device unchanged."""
    apply_fn, params = _net()
    img = jnp.asarray(np.random.RandomState(2).rand(1, 40, 16, 3).astype(np.float32))
    out = spatial_infer(apply_fn, params, img, scale=4,
                        mesh=create_spatial_mesh(), halo=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(apply_fn(params, img)),
                               rtol=1e-6, atol=1e-6)


def test_spatial_via_sr_model():
    """Config surface: spatial_infer: true routes model.test through the
    sharded path."""
    from ssl_tpu.models import build_model

    opt = {"name": "sp", "model_type": "SRModel", "scale": 4, "is_train": False,
           "manual_seed": 0, "spatial_infer": True, "spatial_halo": 16,
           "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1,
                         "upscale": 4},
           "path": {}, "datasets": {}}
    model = build_model(opt)
    state = model.init_state()
    lq = np.random.RandomState(3).rand(1, 256, 16, 3).astype(np.float32)
    out = model.test(state, lq)
    direct = model._apply_g(model_params(state), jnp.asarray(lq))
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def model_params(state):
    return state.ema_params_g if getattr(state, "ema_params_g", None) is not None \
        else state.params_g
