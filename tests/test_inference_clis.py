"""Smoke tests for the per-arch inference CLIs (reference surface:
GAN-Based-SR/inference/*.py)."""
import pytest
import importlib.util
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_INF = os.path.join(_ROOT, "inference")


def _load_cli(name):
    if _INF not in sys.path:
        sys.path.insert(0, _INF)
    spec = importlib.util.spec_from_file_location(name, os.path.join(_INF, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_inference_rrdbnet_cli(tmp_path, monkeypatch):
    from PIL import Image
    from ssl_tpu.archs import build_network
    from ssl_tpu.utils.weight_port import export_rrdbnet_to_torch

    net = build_network(dict(type="RRDBNet", num_feat=8, num_block=2))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    ckpt = str(tmp_path / "net_g.pth")
    export_rrdbnet_to_torch(v["params"], ckpt)
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    Image.fromarray((np.random.RandomState(1).rand(16, 16, 3) * 255)
                    .astype(np.uint8)).save(in_dir / "a.png")
    out_dir = str(tmp_path / "out")
    mod = _load_cli("inference_rrdbnet")
    monkeypatch.setattr(sys, "argv", [
        "x", "--input", str(in_dir), "--output", out_dir, "--model_path", ckpt,
        "--num_feat", "8", "--num_block", "2", "--param_key", "params"])
    mod.main()
    out = np.asarray(Image.open(os.path.join(out_dir, "a_RRDBNet.png")))
    assert out.shape == (64, 64, 3) and np.isfinite(out).all()


def test_inference_basicvsr_cli(tmp_path, monkeypatch):
    from PIL import Image
    from ssl_tpu.archs import build_network

    net = build_network(dict(type="BasicVSR", num_feat=8, num_block=1))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 3)))
    ckpt = str(tmp_path / "basicvsr.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump({"params": jax.tree_util.tree_map(np.asarray, v["params"])}, f)
    in_dir = tmp_path / "frames"
    os.makedirs(in_dir)
    rng = np.random.RandomState(2)
    for i in range(4):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)) \
            .save(in_dir / f"f{i:02d}.png")
    out_dir = str(tmp_path / "out")
    mod = _load_cli("inference_basicvsr")
    monkeypatch.setattr(sys, "argv", [
        "x", "--input", str(in_dir), "--output", out_dir, "--model_path", ckpt,
        "--num_feat", "8", "--num_block", "1", "--interval", "2"])
    mod.main()
    outs = sorted(os.listdir(out_dir))
    assert len(outs) == 4
    arr = np.asarray(Image.open(os.path.join(out_dir, outs[0])))
    assert arr.shape == (256, 256, 3)


def test_inference_stylegan2_cli(tmp_path, monkeypatch):
    from PIL import Image
    from ssl_tpu.archs import build_network

    net = build_network(dict(type="StyleGAN2Generator", out_size=16,
                             num_style_feat=16, num_mlp=2,
                             channel_multiplier=1, narrow=0.25))
    v = net.init(jax.random.PRNGKey(0), [jnp.zeros((1, 16))])
    ckpt = str(tmp_path / "g.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump({"params_ema": jax.tree_util.tree_map(np.asarray, v["params"])}, f)
    out_dir = str(tmp_path / "samples")
    mod = _load_cli("inference_stylegan2")
    # the tiny generator uses non-default num_mlp/cm/narrow: patch the builder
    import ssl_tpu.archs as archs_pkg
    orig = archs_pkg.build_network

    def patched(cfg):
        if cfg.get("type") == "StyleGAN2Generator":
            cfg = dict(cfg, num_mlp=2, channel_multiplier=1, narrow=0.25)
        return orig(cfg)

    monkeypatch.setattr(archs_pkg, "build_network", patched)
    monkeypatch.setattr(sys, "argv", [
        "x", "--output", out_dir, "--model_path", ckpt, "--out_size", "16",
        "--num_style_feat", "16", "--num_samples", "2", "--truncation", "0.7",
        "--truncation_mean_samples", "64"])
    mod.main()
    files = sorted(os.listdir(out_dir))
    assert len(files) == 2
    arr = np.asarray(Image.open(os.path.join(out_dir, files[0])))
    assert arr.shape == (16, 16, 3)
