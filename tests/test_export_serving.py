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
