"""End-to-end diffusion inference CLI (test_cli) on a tiny config, incl. the
CFW --vqgan_ckpt decode path."""
import os
import pickle
import sys

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow


def _tiny_cfg():
    return {
        "model": {
            "timesteps": 50, "beta_schedule": "linear",
            "parameterization": "eps", "scale_factor": 0.18215,
            "context_dim": 32,
            "unet": {"model_channels": 32, "num_res_blocks": 1,
                     "channel_mult": [1, 2], "attention_resolutions": [2],
                     "num_heads": 4},
            "first_stage": {"embed_dim": 4, "ch": 16, "ch_mult": [1, 2, 2, 2],
                            "num_res_blocks": 1},
        },
        "sslopt": {"kernel_size_search": 9, "kernel_size_window": 5,
                   "mask_stride": 3, "l1_weight": 0.5, "kl_weight": 0.5},
        "train": {"lr": 1e-4},
    }


def test_diffusion_test_cli_end_to_end(tmp_path, monkeypatch):
    from PIL import Image
    from ssl_tpu.diffusion.main import build_from_config
    from ssl_tpu.diffusion import test_cli

    cfg = _tiny_cfg()
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    model = build_from_config(cfg)
    state = model.init_state(gt_shape=(1, 32, 32, 3))
    ckpt = str(tmp_path / "state.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, state.params), f)

    # CFW decoder params from a fresh AutoencoderKLResi with the same geometry
    from ssl_tpu.diffusion.vae import AutoencoderKLResi
    resi = AutoencoderKLResi(**cfg["model"]["first_stage"])
    rv = resi.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    vq = str(tmp_path / "cfw.pkl")
    with open(vq, "wb") as f:
        pickle.dump({"params": jax.tree_util.tree_map(np.asarray, rv["params"])}, f)

    lq_dir = tmp_path / "lq"
    os.makedirs(lq_dir)
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(lq_dir / "a.png")
    out_dir = str(tmp_path / "out")

    for extra in ([], ["--vqgan_ckpt", vq]):
        argv = ["test_cli", "--config", cfg_path, "--ckpt", ckpt,
                "--init-img", str(lq_dir), "--outdir", out_dir,
                "--ddpm_steps", "3", "--upscale", "4",
                "--colorfix_type", "adain"] + extra
        monkeypatch.setattr(sys, "argv", argv)
        test_cli.main()
        assert os.path.exists(os.path.join(out_dir, "a.png"))
        out = np.asarray(Image.open(os.path.join(out_dir, "a.png")))
        assert out.shape[0] == 64 and np.isfinite(out).all()


def test_apply_dotlist_overrides():
    """OmegaConf-style key=value CLI overrides (reference main.py:482,535)."""
    from ssl_tpu.diffusion.main import apply_dotlist

    cfg = {"train": {"lr": 1e-4}, "sslopt": {"mask_stride": 3}}
    out = apply_dotlist(cfg, ["train.max_steps=5", "train.lr=2e-4",
                              "sslopt.simself_strategy=areaarea",
                              "model.unet.model_channels=32",
                              "degradation.jpeg_range=[60, 95]"])
    assert out["train"]["max_steps"] == 5
    assert out["train"]["lr"] == 2e-4
    assert out["sslopt"]["simself_strategy"] == "areaarea"
    assert out["model"]["unet"]["model_channels"] == 32
    assert out["degradation"]["jpeg_range"] == [60, 95]


def test_diffusion_test_cli_tensor_parallel(tmp_path, monkeypatch):
    """--tp 4: UNet weights Megatron-sharded for sampling; output matches the
    single-device CLI run up to reduction-order rounding."""
    from PIL import Image
    from ssl_tpu.diffusion.main import build_from_config
    from ssl_tpu.diffusion import test_cli

    assert len(jax.devices()) >= 4
    cfg = _tiny_cfg()
    cfg["model"]["unet"]["num_head_channels"] = 8
    cfg["model"]["unet"].pop("num_heads", None)
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    model = build_from_config(cfg)
    state = model.init_state(gt_shape=(1, 32, 32, 3))
    ckpt = str(tmp_path / "state.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, state.params), f)

    lq_dir = tmp_path / "lq"
    os.makedirs(lq_dir)
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(lq_dir / "a.png")

    outs = {}
    for label, extra in {"single": [], "tp": ["--tp", "4"]}.items():
        out_dir = str(tmp_path / f"out_{label}")
        argv = ["test_cli", "--config", cfg_path, "--ckpt", ckpt,
                "--init-img", str(lq_dir), "--outdir", out_dir,
                "--ddpm_steps", "3", "--upscale", "4",
                "--colorfix_type", "nofix"] + extra
        monkeypatch.setattr(sys, "argv", argv)
        test_cli.main()
        outs[label] = np.asarray(Image.open(os.path.join(out_dir, "a.png"))
                                 ).astype(np.int16)
    assert outs["single"].shape == outs["tp"].shape == (64, 64, 3)
    assert np.abs(outs["single"] - outs["tp"]).max() <= 2
