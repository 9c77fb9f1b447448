"""Stage-2 CFW pipeline end-to-end: gt_input_output dump -> cfw_train CLI.

Covers the reference's stage-2 data/training flow
(scripts/gt_input_output.py -> SingleImageNPDataset {gts,inputs,latents,
samples} -> AutoencoderKLResi training via main.py) through our CLIs: the
dump script writes the reference folder layout including the stage-1 LATENT
.npy, and the CFW trainer consumes the latent directly (descaled like the
reference's get_input), on both a single device and a data-parallel mesh.
"""

import os
import pickle
import subprocess
import sys
import types

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.slow

_DIFF_CFG = {
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


def test_gt_input_output_then_cfw_train(tmp_path):
    import jax.numpy as jnp
    from PIL import Image
    from ssl_tpu.diffusion.main import build_from_config

    # stage-1 ckpt + GT folder
    cfg_path = str(tmp_path / "diff.yml")
    yaml.safe_dump(_DIFF_CFG, open(cfg_path, "w"))
    model = build_from_config(_DIFF_CFG)
    state = model.init_state(gt_shape=(1, 32, 32, 3))
    ckpt = str(tmp_path / "diff.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, state.params), f)
    gt_dir = tmp_path / "gtsrc"
    os.makedirs(gt_dir)
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)
                        ).save(gt_dir / f"im{i}.png")

    dump = str(tmp_path / "dump")
    r = subprocess.run(
        [sys.executable, "scripts/gt_input_output.py", "--config", cfg_path,
         "--ckpt", ckpt, "--gt_dir", str(gt_dir), "--outdir", dump,
         "--ddpm_steps", "2"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    for sub in ("gts", "inputs", "latents", "samples"):
        assert len(os.listdir(os.path.join(dump, sub))) == 3, sub
    z = np.load(os.path.join(dump, "latents", "im0.npy"))
    assert z.shape == (8, 8, 4) and np.isfinite(z).all()   # 64/8, embed 4

    # CFW trainer consumes the dump root (latent path), dp mesh, overrides
    from ssl_tpu.diffusion import cfw_train
    cfw_cfg = {
        # geometry must match the stage-1 first_stage (/8 latent, embed 4) —
        # the dumped latent is decoded directly
        "vae": {"embed_dim": 4, "ch": 16, "ch_mult": [1, 2, 2, 2],
                "num_res_blocks": 1},
        "data": {"batch_size": 2, "crop_size": 0,
                 "train": {"gt_path": [dump]}},
        "train": {"max_steps": 2, "log_every": 1, "save_every": 2, "lr": 1e-4},
        "parallel": {"data": 2},
    }
    base = str(tmp_path / "cfw.yml")
    yaml.safe_dump(cfw_cfg, open(base, "w"))
    args = types.SimpleNamespace(base=base, logdir=str(tmp_path / "cfwlogs"),
                                 data_root=None, resume=None, overrides=None)
    end_state = cfw_train.train(args)
    assert int(end_state.step) == 2
    leaf = jax.tree_util.tree_leaves(end_state.params_g)[0]
    assert len(leaf.sharding.device_set) == 2          # replicated over mesh
    assert os.path.exists(tmp_path / "cfwlogs" / "cfw_2.pkl")
    assert os.path.exists(tmp_path / "cfwlogs" / "cfw_state_2.pkl")

    # the exported params drive test_cli --vqgan_ckpt (consumer contract)
    with open(tmp_path / "cfwlogs" / "cfw_2.pkl", "rb") as f:
        payload = pickle.load(f)
    assert "params" in payload and "encoder" in payload["params"]

    # resume continues from the saved state
    cfw_cfg["train"]["max_steps"] = 3
    cfw_cfg["train"]["save_every"] = 3
    yaml.safe_dump(cfw_cfg, open(base, "w"))
    args.resume = str(tmp_path / "cfwlogs" / "cfw_state_2.pkl")
    end2 = cfw_train.train(args)
    assert int(end2.step) == 3


def test_cfw_cli_accepts_reference_autoencoder_schema(tmp_path):
    """The reference configs/autoencoder OmegaConf schema is drop-in on the
    CFW CLI (tiny-ified geometry via key=value overrides)."""
    import copy
    ref_path = ("/root/reference/Diffusion-Based-SR/configs/autoencoder/"
                "autoencoder_kl_64x64x4_resi.yaml")
    with open(ref_path) as f:
        ref_cfg = yaml.safe_load(f)
    base = str(tmp_path / "ref_cfw.yml")
    yaml.safe_dump(ref_cfg, open(base, "w"))

    # tiny triplet root (no latents -> encoder-mean fallback)
    from PIL import Image
    dump = tmp_path / "dump"
    rng = np.random.RandomState(0)
    for sub in ("gts", "inputs", "samples"):
        os.makedirs(dump / sub)
        for i in range(2):
            Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)
                            ).save(dump / sub / f"{i}.png")

    from ssl_tpu.diffusion import cfw_train
    args = types.SimpleNamespace(
        base=base, logdir=str(tmp_path / "logs"), data_root=str(dump),
        resume=None,
        overrides=["vae.ch=8", "vae.ch_mult=[1,2]", "vae.num_res_blocks=1",
                   "train.max_steps=1", "train.save_every=1",
                   "train.log_every=1", "data.batch_size=1",
                   "path.pretrain_vae=null"])
    state = cfw_train.train(args)
    assert int(state.step) == 1
