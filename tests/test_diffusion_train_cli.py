"""End-to-end diffusion TRAIN CLI (ssl_tpu.diffusion.main --train).

Drives the real CLI surface (reference: Diffusion-Based-SR/main.py --train)
over synthetic GT+mask fixtures: dataset -> host degrader -> jitted
StableSR-SSL step -> checkpoints, then --resume, then the same config on a
2-D (data, model) tensor-parallel mesh.
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.slow


def _fixtures(tmp_path, n=20, size=48):
    import cv2
    from scipy.io import savemat
    gt, mask = tmp_path / "gt", tmp_path / "mask"
    os.makedirs(gt), os.makedirs(mask)
    rng = np.random.RandomState(0)
    for i in range(n):
        cv2.imwrite(str(gt / f"img{i}.png"),
                    (rng.rand(size, size, 3) * 255).astype(np.uint8))
        savemat(str(mask / f"img{i}.mat"),
                {"mat": (rng.rand(size, size) < 0.2).astype(np.float64)})
    return str(gt), str(mask)


def _cfg(gt_dir, mask_dir, **train_extra):
    return {
        "model": {
            "timesteps": 50, "beta_schedule": "linear",
            "parameterization": "eps", "scale_factor": 0.18215,
            "context_dim": 32,
            "unet": {"model_channels": 32, "num_res_blocks": 1,
                     "channel_mult": [1, 2], "attention_resolutions": [2],
                     "num_head_channels": 8},
            "first_stage": {"embed_dim": 4, "ch": 16, "ch_mult": [1, 2, 2, 2],
                            "num_res_blocks": 1},
        },
        "sslopt": {"kernel_size_search": 9, "kernel_size_window": 5,
                   "mask_stride": 3, "l1_weight": 0.5, "kl_weight": 0.5,
                   "capacity": 64},
        "data": {"crop_size": 32, "batch_size": 2, "num_workers": 0,
                 "train": {"type": "TwoStageDegradationImgMaskDataset",
                           "dataroot_gt": gt_dir,
                           "dataroot_gt_mask": mask_dir}},
        "train": {"lr": 1e-4, "max_steps": 2, "log_every": 1,
                  "save_every": 2, "image_every": 0, **train_extra},
    }


def _run(cfg, tmp_path, logdir, resume=None):
    from ssl_tpu.diffusion.main import train
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    args = types.SimpleNamespace(base=cfg_path, logdir=str(tmp_path / logdir),
                                 resume=resume, overrides=None)
    return train(args)


def test_diffusion_train_cli_end_to_end_and_resume(tmp_path):
    gt_dir, mask_dir = _fixtures(tmp_path)
    cfg = _cfg(gt_dir, mask_dir)

    state = _run(cfg, tmp_path, "logs")
    assert int(state.step) == 2
    log_dir = tmp_path / "logs"
    assert (log_dir / "ckpt_2.pkl").exists()         # params-only (test_cli)
    assert (log_dir / "train_state_2.pkl").exists()  # full state (--resume)
    with open(log_dir / "ckpt_2.pkl", "rb") as f:
        params = pickle.load(f)
    assert set(params) == {"unet", "structcond", "null_context"}

    # --resume auto: picks train_state_2.pkl, continues to max_steps=4
    cfg_resume = _cfg(gt_dir, mask_dir, max_steps=4, save_every=4)
    state2 = _run(cfg_resume, tmp_path, "logs", resume="auto")
    assert int(state2.step) == 4
    assert (log_dir / "train_state_4.pkl").exists()


def test_diffusion_train_cli_tensor_parallel(tmp_path):
    """Same CLI on a dp x tp = 2 x 4 mesh via `parallel: {data: 2, tp: 4}`."""
    assert len(jax.devices()) >= 8
    gt_dir, mask_dir = _fixtures(tmp_path)
    cfg = _cfg(gt_dir, mask_dir)
    cfg["parallel"] = {"data": 2, "tp": 4}
    state = _run(cfg, tmp_path, "logs_tp")
    assert int(state.step) == 2
    from jax.sharding import PartitionSpec as P
    k = state.params["unet"]["input_blocks_1_0"]["in_layers_2"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")


def test_diffusion_train_cli_orbax_backend_sharded_resume(tmp_path):
    """train.ckpt_backend=orbax on a dp x tp mesh: the sharded state saves
    without host-gather and `--resume auto` restores straight into the mesh
    layout, continuing to the new max_steps."""
    gt_dir, mask_dir = _fixtures(tmp_path)
    cfg = _cfg(gt_dir, mask_dir, ckpt_backend="orbax")
    cfg["parallel"] = {"data": 2, "tp": 4}

    state = _run(cfg, tmp_path, "logs_orbax")
    assert int(state.step) == 2
    log_dir = tmp_path / "logs_orbax"
    assert (log_dir / "state_orbax_2").is_dir()
    assert (log_dir / "latest").read_text().strip() == "2"
    assert not (log_dir / "train_state_2.pkl").exists()

    cfg2 = _cfg(gt_dir, mask_dir, max_steps=4, save_every=4,
                ckpt_backend="orbax")
    cfg2["parallel"] = {"data": 2, "tp": 4}
    state2 = _run(cfg2, tmp_path, "logs_orbax", resume="auto")
    assert int(state2.step) == 4
    from jax.sharding import PartitionSpec as P
    k = state2.params["unet"]["input_blocks_1_0"]["in_layers_2"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")
