"""End-to-end eval CLI (ssl_tpu.test test_pipeline) on a synthetic test set
with a torch-layout pretrained checkpoint (exercises the converter path too)."""
import os

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")


def test_eval_pipeline_end_to_end(tmp_path):
    from PIL import Image
    import jax.numpy as jnp
    from ssl_tpu.archs import build_network
    from ssl_tpu.utils.weight_port import export_rrdbnet_to_torch
    from ssl_tpu.test import test_pipeline

    # synthetic paired test set: 2 images, x4
    gt_dir, lq_dir = tmp_path / "GT", tmp_path / "LR"
    os.makedirs(gt_dir)
    os.makedirs(lq_dir)
    rng = np.random.RandomState(0)
    for i in range(2):
        gt = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(gt).save(gt_dir / f"{i}.png")
        Image.fromarray(gt[::4, ::4]).save(lq_dir / f"{i}.png")

    # torch-layout checkpoint of a tiny RRDBNet (tests the .pth load path)
    net = build_network(dict(type="RRDBNet", num_feat=8, num_block=2, num_grow_ch=4))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    ckpt = str(tmp_path / "net_g.pth")
    export_rrdbnet_to_torch(v["params"], ckpt)

    opt = {
        "name": "tiny_eval", "model_type": "SRModel", "scale": 4,
        "manual_seed": 0, "num_gpu": 1,
        "datasets": {"test_1": {"name": "TinySet", "type": "PairedImageDataset",
                                "dataroot_gt": str(gt_dir), "dataroot_lq": str(lq_dir),
                                "io_backend": {"type": "disk"}, "phase": "test",
                                "scale": 4}},
        "network_g": {"type": "RRDBNet", "num_feat": 8, "num_block": 2,
                      "num_grow_ch": 4},
        "path": {"pretrain_network_g": ckpt, "param_key_g": "params",
                 "results_root": str(tmp_path / "results"),
                 "log": str(tmp_path / "results")},
        "val": {"save_img": True,
                "metrics": {"psnr": {"type": "calculate_psnr", "crop_border": 4,
                                     "test_y_channel": True},
                            "ssim": {"type": "calculate_ssim", "crop_border": 4,
                                     "test_y_channel": True}}},
        "is_train": False, "dist": False,
    }
    opt_path = str(tmp_path / "opt.yml")
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)

    results = test_pipeline(str(tmp_path), args=["-opt", opt_path])
    assert "TinySet" in results
    m = results["TinySet"]
    assert np.isfinite(m["psnr"]) and 0.0 <= m["ssim"] <= 1.0
    # saved SR images exist
    found = []
    for root, _, files in os.walk(tmp_path / "results"):
        found += [f for f in files if f.endswith(".png")]
    assert len(found) >= 2


def test_inference_cli_end_to_end(tmp_path, monkeypatch):
    """inference/inference_ssl_sr.py with a torch .pth and tiling."""
    import sys
    from PIL import Image
    import importlib.util
    import jax.numpy as jnp
    from ssl_tpu.archs import build_network
    from ssl_tpu.utils.weight_port import export_rrdbnet_to_torch

    net = build_network(dict(type="RRDBNet", num_feat=8, num_block=2, num_grow_ch=4))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    ckpt = str(tmp_path / "net_g.pth")
    export_rrdbnet_to_torch(v["params"], ckpt)

    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    rng = np.random.RandomState(1)
    Image.fromarray((rng.rand(24, 20, 3) * 255).astype(np.uint8)).save(in_dir / "x.png")
    out_dir = str(tmp_path / "out")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "inf_cli", os.path.join(root, "inference", "inference_ssl_sr.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [
        "inference_ssl_sr", "--input", str(in_dir), "--output", out_dir,
        "--model_path", ckpt, "--num_feat", "8", "--num_block", "2",
        "--param_key", "params", "--net_opt", '{"num_grow_ch": 4}',
        "--tile_size", "16", "--tile_pad", "4"])
    mod.main()
    out = np.asarray(Image.open(os.path.join(out_dir, "x.png")))
    assert out.shape == (96, 80, 3) and np.isfinite(out).all()


def test_eval_parity_harness_end_to_end(tmp_path):
    """scripts/eval_parity.py: full protocol (mod-12 crop -> matlab bicubic ->
    infer -> metric table) PLUS the reference-torch parity columns, on a tiny
    RRDBNet exported to a torch .pth (VERDICT r2 next-#10)."""
    import importlib.util
    import jax.numpy as jnp
    from ssl_tpu.archs import build_network
    from ssl_tpu.utils.weight_port import export_rrdbnet_to_torch

    net = build_network(dict(type="RRDBNet", num_feat=8, num_block=2, num_grow_ch=4))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    ckpt = str(tmp_path / "net_g.pth")
    export_rrdbnet_to_torch(v["params"], ckpt)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "eval_parity", os.path.join(root, "scripts", "eval_parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    result = mod.main([
        "--ckpt", ckpt,
        "--arch", '{"type": "RRDBNet", "num_feat": 8, "num_block": 2, "num_grow_ch": 4}',
        "--synthetic", "2", "--synthetic-size", "48", "--param-key", "params",
        "--out", str(tmp_path / "sr"), "--json",
        "--ref-spec", '{"module": "basicsr.archs.rrdbnet_arch", "cls": "RRDBNet",'
                      ' "kwargs": {"num_in_ch": 3, "num_out_ch": 3, "num_feat": 8,'
                      ' "num_block": 2, "num_grow_ch": 4}}'])

    assert result["n_images"] == 2
    for k in ("psnr", "ssim", "psnr_y", "ssim_y", "niqe"):
        assert k in result["ours"] and k in result["reference"]
    # same weights through the converter -> elementwise-equal outputs
    assert result["parity"]["max_abs_diff"] < 5e-4
    assert result["parity"]["min_output_psnr"] > 60
    # PNGs written
    assert len(os.listdir(tmp_path / "sr")) == 2
