"""Serving export: jax.export StableHLO artifact round trip (scripts/
export_serving.py) — the deployment path the reference doesn't have."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow


def test_export_serving_cli_roundtrip(tmp_path):
    import yaml
    from ssl_tpu.archs import build_network

    cfg = {"name": "srv", "scale": 4,
           "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1,
                         "upscale": 4}}
    opt_path = str(tmp_path / "srv.yml")
    yaml.safe_dump(cfg, open(opt_path, "w"))
    net = build_network({**cfg["network_g"], "scale": 4})
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    ckpt = str(tmp_path / "srv.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump({"params": jax.tree_util.tree_map(np.asarray, params)}, f)
    dst = str(tmp_path / "srv.stablehlo")

    r = subprocess.run(
        [sys.executable, "scripts/export_serving.py", "--opt", opt_path,
         "--ckpt", ckpt, "--height", "24", "--width", "16", "--dst", dst,
         "--check"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    assert "check: deserialized artifact matches" in r.stdout

    # the artifact stands alone: deserialize + call in this process
    from jax import export as jexport
    with open(dst, "rb") as f:
        back = jexport.deserialize(f.read())
    x = np.random.RandomState(0).rand(1, 24, 16, 3).astype(np.float32)
    direct = net.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(back.call(x)), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_export_serving_diffusion_pipeline(tmp_path):
    """--diffusion: the whole encode -> sampler scan -> decode pipeline
    exports to one StableHLO artifact and round-trips bit-close."""
    import yaml
    from ssl_tpu.diffusion.main import build_from_config

    cfg = {
        "model": {
            "timesteps": 50, "context_dim": 32,
            "unet": {"model_channels": 32, "num_res_blocks": 1,
                     "channel_mult": [1, 2], "attention_resolutions": [2],
                     "num_head_channels": 8},
            "first_stage": {"embed_dim": 4, "ch": 16, "ch_mult": [1, 2, 2, 2],
                            "num_res_blocks": 1},
        },
        "sslopt": {"kernel_size_search": 9, "kernel_size_window": 5},
    }
    cfg_path = str(tmp_path / "d.yml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    model = build_from_config(cfg)
    state = model.init_state(gt_shape=(1, 32, 32, 3))
    ckpt = str(tmp_path / "d.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, state.params), f)
    dst = str(tmp_path / "d.stablehlo")

    r = subprocess.run(
        [sys.executable, "scripts/export_serving.py", "--diffusion",
         "--opt", cfg_path, "--ckpt", ckpt, "--height", "32", "--width", "32",
         "--steps", "3", "--sampler", "ddim", "--dst", dst, "--check"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    assert "check: deserialized artifact matches" in r.stdout

    from jax import export as jexport
    with open(dst, "rb") as f:
        back = jexport.deserialize(f.read())
    lq = np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32)
    out = np.asarray(back.call(lq, np.asarray([3], np.uint32)))
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0
    # deterministic given the seed
    out2 = np.asarray(back.call(lq, np.asarray([3], np.uint32)))
    np.testing.assert_array_equal(out, out2)
