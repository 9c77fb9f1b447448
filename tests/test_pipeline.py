"""End-to-end pipeline tests: YAML -> dataloaders -> train loop -> checkpoint
-> resume, on synthetic data (reference test style: test_sr_model.py but
driving the real train_pipeline)."""
import os

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow


def _make_synthetic_dataset(root, n=4, gt=64, scale=4):
    import cv2
    from scipy.io import savemat
    gt_dir = os.path.join(root, "gt")
    lq_dir = os.path.join(root, "lq")
    mask_dir = os.path.join(root, "mask")
    for d in (gt_dir, lq_dir, mask_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        img = (rng.rand(gt, gt, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(gt_dir, f"img{i}.png"), img)
        lq = cv2.resize(img, (gt // scale, gt // scale), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(os.path.join(lq_dir, f"img{i}.png"), lq)
        mask = (rng.rand(gt, gt) < 0.2).astype(np.float64)
        savemat(os.path.join(mask_dir, f"img{i}.mat"), {"mat": mask})
    return gt_dir, lq_dir, mask_dir


def _write_opt(tmp_path, gt_dir, lq_dir, mask_dir, **overrides):
    opt = {
        "name": "tiny_e2e", "model_type": "ESRGANSSLModel", "scale": 4,
        "manual_seed": 0,
        "datasets": {
            "train": {"name": "synth", "type": "PairedImageMaskDataset",
                      "dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
                      "dataroot_gt_mask": mask_dir, "gt_size": 32,
                      "use_hflip": True, "use_rot": True,
                      "batch_size_per_gpu": 2, "num_worker_per_gpu": 1,
                      "dataset_enlarge_ratio": 1},
            "val": {"name": "synthval", "type": "PairedImageDataset",
                    "dataroot_gt": gt_dir, "dataroot_lq": lq_dir},
        },
        "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1, "upscale": 4},
        "network_d": {"type": "UNetDiscriminatorSN", "num_feat": 4},
        "path": {},
        "ssl_setting": {"mask_stride": 3, "impl": "dense", "kernel_size_search": 9,
                        "sigma": 0.004, "kernel_size_window": 5, "generalization": True},
        "train": {
            "ema_decay": 0.999,
            "optim_g": {"type": "Adam", "lr": 1e-4}, "optim_d": {"type": "Adam", "lr": 1e-4},
            "scheduler": {"type": "MultiStepLR", "milestones": [100], "gamma": 0.5},
            "total_iter": 4, "warmup_iter": -1,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1e-2},
            "selfsim_opt": {"type": "L1Loss", "loss_weight": 1e3},
            "selfsim1_opt": {"type": "KLDistanceLoss", "loss_weight": 1e3},
            "gan_opt": {"type": "GANLoss", "gan_type": "vanilla", "loss_weight": 5e-3},
        },
        "val": {"val_freq": 4, "save_img": False,
                "metrics": {"psnr": {"type": "calculate_psnr", "crop_border": 4,
                                     "test_y_channel": False}}},
        "logger": {"print_freq": 2, "save_checkpoint_freq": 4, "use_tb_logger": False},
    }
    for key, val in overrides.items():
        if isinstance(val, dict) and isinstance(opt.get(key), dict):
            opt[key].update(val)
        else:
            opt[key] = val
    opt_path = os.path.join(tmp_path, f"opt_{opt['name']}.yml")
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    return opt_path


def test_train_pipeline_end_to_end_8device(tmp_path):
    """The REAL CLI on the 8-device CPU mesh (conftest): the production
    multi-chip path — batch sharded over 'data', params replicated, XLA
    all-reduces grads (reference DDP equivalent, base_model.py:87-101)."""
    import jax
    tmp = str(tmp_path)
    gt_dir, lq_dir, mask_dir = _make_synthetic_dataset(tmp, n=16)
    opt_path = _write_opt(tmp, gt_dir, lq_dir, mask_dir)

    from ssl_tpu.train import train_pipeline
    state = train_pipeline(tmp, args=["-opt", opt_path])
    assert int(state.step) == 4
    # params must live replicated across the full 8-device mesh, not on one chip
    leaf = jax.tree_util.tree_leaves(state.params_g)[0]
    assert len(leaf.sharding.device_set) == len(jax.devices()) == 8
    assert leaf.sharding.is_fully_replicated
    # checkpoints written
    models_dir = os.path.join(tmp, "experiments", "tiny_e2e", "models")
    states_dir = os.path.join(tmp, "experiments", "tiny_e2e", "training_states")
    assert any(f.startswith("net_g_") for f in os.listdir(models_dir))
    assert os.path.isdir(os.path.join(states_dir, "4"))

    # resume: run again with auto_resume; should load iter 4 and finish fast
    state2 = train_pipeline(tmp, args=["-opt", opt_path, "--auto_resume"])
    assert int(state2.step) >= 4


def test_train_pipeline_batch_is_data_sharded(tmp_path):
    """Every train_step batch leaf arrives sharded over the 'data' axis."""
    import jax
    from ssl_tpu.models.esrganssl_model import ESRGANSSLModel
    tmp = str(tmp_path)
    gt_dir, lq_dir, mask_dir = _make_synthetic_dataset(tmp, n=16)
    opt_path = _write_opt(tmp, gt_dir, lq_dir, mask_dir,
                          name="shardcheck", train={"total_iter": 1},
                          val={"val_freq": 999, "metrics": {}})
    seen = []
    orig = ESRGANSSLModel.train_step

    def spy(self, state, batch):
        seen.append({k: v.sharding for k, v in batch.items()})
        return orig(self, state, batch)

    ESRGANSSLModel.train_step = spy
    try:
        from ssl_tpu.train import train_pipeline
        train_pipeline(tmp, args=["-opt", opt_path])
    finally:
        ESRGANSSLModel.train_step = orig
    assert seen
    for sh in seen[0].values():
        assert len(sh.device_set) == 8, f"batch not on the mesh: {sh}"
        assert not sh.is_fully_replicated, f"batch replicated, not sharded: {sh}"


def test_train_pipeline_1dev_vs_8dev_loss_equality(tmp_path):
    """Same global batch (1×8 devices vs 8×1 device), same seeds → the two
    runs must produce the same updated parameters (DDP ≡ single-process
    equivalence; only float reduction order may differ)."""
    import numpy as np
    import jax
    tmp = str(tmp_path)
    gt_dir, lq_dir, mask_dir = _make_synthetic_dataset(tmp, n=8)
    from ssl_tpu.train import train_pipeline

    states = {}
    for name, num_devices, bpg in (("dev1", 1, 8), ("dev8", 8, 1)):
        opt_path = _write_opt(
            tmp, gt_dir, lq_dir, mask_dir, name=name, num_devices=num_devices,
            datasets={"train": {
                "name": "synth", "type": "PairedImageMaskDataset",
                "dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
                "dataroot_gt_mask": mask_dir, "gt_size": 32,
                "use_hflip": False, "use_rot": False,
                "batch_size_per_gpu": bpg, "num_worker_per_gpu": 1,
                "dataset_enlarge_ratio": 1}},
            train={"total_iter": 2}, val={"val_freq": 999, "metrics": {}})
        states[name] = train_pipeline(tmp, args=["-opt", opt_path])

    flat1 = jax.tree_util.tree_leaves(states["dev1"].params_g)
    flat8 = jax.tree_util.tree_leaves(states["dev8"].params_g)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_orbax_state_roundtrip(tmp_path):
    from ssl_tpu.models import build_model
    import jax
    import jax.numpy as jnp
    opt = {
        "name": "ckpt", "model_type": "SRModel", "scale": 4, "is_train": True,
        "manual_seed": 0, "datasets": {"train": {"gt_size": 32}},
        "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 1, "upscale": 4},
        "path": {},
        "train": {"ema_decay": 0.999, "optim_g": {"type": "Adam", "lr": 1e-4},
                  "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0}},
    }
    model = build_model(opt)
    state = model.init_state(lq_shape=(1, 8, 8, 3))
    batch = {"lq": jnp.zeros((1, 8, 8, 3)), "gt": jnp.ones((1, 32, 32, 3)) * 0.5}
    state, _ = model.train_step(state, batch)
    sd = str(tmp_path / "states")
    os.makedirs(sd, exist_ok=True)
    model.save_training_state(state, sd, epoch=0, current_iter=1)
    template = model.init_state(lq_shape=(1, 8, 8, 3))
    restored, it = model.load_training_state(template, sd, "latest")
    assert it == 1
    a = jax.tree_util.tree_leaves(state.params_g)[0]
    b = jax.tree_util.tree_leaves(restored.params_g)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
