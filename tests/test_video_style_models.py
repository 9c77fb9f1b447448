"""Integration tests for the vendored-basicsr training recipes rebuilt here:
video (base/recurrent/EDVR/GAN variants), StyleGAN2, HiFaceGAN.

Reference: Diffusion-Based-SR/basicsr/models/{video_base_model,
video_recurrent_model,edvr_model,video_gan_model,video_recurrent_gan_model,
stylegan2_model,hifacegan_model}.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl_tpu.models import build_model

pytestmark = pytest.mark.slow


def _leaf_diff(a, b):
    return {"/".join(str(getattr(k, "key", k)) for k in p): float(jnp.max(jnp.abs(x - y)))
            for (p, x), (_, y) in zip(jax.tree_util.tree_leaves_with_path(a),
                                      jax.tree_util.tree_leaves_with_path(b))}


def _video_batch(b=1, t=5, lq=8, scale=4, gt_seq=False, seed=0):
    rng = np.random.RandomState(seed)
    gt_shape = (b, t, lq * scale, lq * scale, 3) if gt_seq else \
        (b, lq * scale, lq * scale, 3)
    return {"lq": jnp.asarray(rng.rand(b, t, lq, lq, 3), jnp.float32),
            "gt": jnp.asarray(rng.rand(*gt_shape), jnp.float32)}


def _edvr_opt(model_type="VideoBaseModel", **train_extra):
    opt = {
        "name": "tiny-video", "model_type": model_type, "scale": 4,
        "is_train": True, "manual_seed": 0, "num_gpu": 1,
        "datasets": {"train": {"gt_size": 32, "num_frame": 5}},
        "network_g": {"type": "EDVR", "num_feat": 8, "num_frame": 5,
                      "deform_groups": 2, "num_extract_block": 1,
                      "num_reconstruct_block": 1},
        "path": {},
        "train": {
            "optim_g": {"type": "Adam", "lr": 1e-3, "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [50], "gamma": 0.5},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            **train_extra,
        },
        "val": {"metrics": {"psnr": {"type": "calculate_psnr", "crop_border": 0,
                                     "test_y_channel": False}}},
    }
    return opt


def test_video_base_model_steps():
    model = build_model(_edvr_opt())
    state = model.init_state(lq_shape=model.train_init_shape(1, 8))
    batch = _video_batch()
    losses = []
    for _ in range(3):
        state, logs = model.train_step(state, batch)
        losses.append(float(logs["l_pix"]))
    assert all(np.isfinite(losses))
    assert losses[-1] <= losses[0]


def test_edvr_model_tsa_freeze_and_dcn_lr():
    """tsa_iter freezes everything except 'fusion' (reference
    edvr_model.py:48-62); dcn_lr_mul scales the dcn updates."""
    model = build_model(_edvr_opt("EDVRModel", tsa_iter=2, dcn_lr_mul=0.5))
    state = model.init_state(lq_shape=model.train_init_shape(1, 8))
    p0 = jax.tree_util.tree_map(jnp.copy, state.params_g)
    state, _ = model.train_step(state, _video_batch())
    diffs = _leaf_diff(p0, state.params_g)
    moved_non_fusion = [k for k, d in diffs.items() if d > 0 and "fusion" not in k.lower()]
    moved_fusion = [k for k, d in diffs.items() if d > 0 and "fusion" in k.lower()]
    assert not moved_non_fusion, moved_non_fusion[:5]
    assert moved_fusion
    # step 2 == tsa_iter: everything trains
    state, _ = model.train_step(state, _video_batch())
    diffs2 = _leaf_diff(p0, state.params_g)
    assert any(d > 0 for k, d in diffs2.items() if "fusion" not in k.lower())


def _basicvsr_opt(model_type="VideoRecurrentModel", **train_extra):
    opt = _edvr_opt(model_type, **train_extra)
    opt["datasets"]["train"]["num_frame"] = 3
    opt["network_g"] = {"type": "BasicVSR", "num_feat": 8, "num_block": 1}
    return opt


def test_video_recurrent_model_fix_flow():
    """fix_flow freezes spynet params for the first N-1 iters and flow_lr_mul
    scales its updates after (reference video_recurrent_model.py:22-64)."""
    model = build_model(_basicvsr_opt(fix_flow=2, flow_lr_mul=0.5))
    state = model.init_state(lq_shape=model.train_init_shape(1, 64))
    p0 = jax.tree_util.tree_map(jnp.copy, state.params_g)
    batch = _video_batch(t=3, lq=64, gt_seq=True)
    state, logs = model.train_step(state, batch)
    diffs = _leaf_diff(p0, state.params_g)
    moved_flow = [k for k, d in diffs.items() if d > 0 and "spynet" in k.lower()]
    assert not moved_flow, moved_flow[:5]
    assert any(d > 0 for k, d in diffs.items() if "spynet" not in k.lower())
    state, _ = model.train_step(state, batch)  # it == fix_flow: trains all
    diffs2 = _leaf_diff(p0, state.params_g)
    assert any(d > 0 for k, d in diffs2.items() if "spynet" in k.lower())


def test_video_gan_model_step():
    opt = _edvr_opt("VideoGANModel")
    opt["network_d"] = {"type": "UNetDiscriminatorSN", "num_in_ch": 3, "num_feat": 4}
    opt["train"]["optim_d"] = {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]}
    opt["train"]["gan_opt"] = {"type": "GANLoss", "gan_type": "vanilla",
                               "loss_weight": 5e-3}
    model = build_model(opt)
    state = model.init_state(lq_shape=model.train_init_shape(1, 8))
    state, logs = model.train_step(state, _video_batch())
    for key in ("l_g_gan", "l_d_real", "l_d_fake"):
        assert np.isfinite(float(logs[key])), key


def test_video_recurrent_gan_model_step():
    """5D G output flattened for the D/perceptual (reference
    video_recurrent_gan_model.py:132-141) + lr_flow scaling."""
    opt = _basicvsr_opt("VideoRecurrentGANModel", fix_flow=2, lr_flow=5e-4)
    opt["network_d"] = {"type": "UNetDiscriminatorSN", "num_in_ch": 3, "num_feat": 4}
    opt["train"]["optim_d"] = {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]}
    opt["train"]["gan_opt"] = {"type": "GANLoss", "gan_type": "vanilla",
                               "loss_weight": 5e-3}
    model = build_model(opt)
    state = model.init_state(lq_shape=model.train_init_shape(1, 64))
    state, logs = model.train_step(state, _video_batch(t=3, lq=64, gt_seq=True))
    for key in ("l_pix", "l_g_gan", "l_d_real", "l_d_fake"):
        assert np.isfinite(float(logs[key])), key


def test_stylegan2_model_lazy_regularization():
    opt = {
        "name": "tiny-sg2", "model_type": "StyleGAN2Model", "scale": 1,
        "is_train": True, "manual_seed": 0, "num_gpu": 1,
        "datasets": {"train": {"gt_size": 16}},
        "network_g": {"type": "StyleGAN2Generator", "out_size": 16,
                      "num_style_feat": 16, "num_mlp": 2, "narrow": 0.03125},
        "network_d": {"type": "StyleGAN2Discriminator", "out_size": 16,
                      "narrow": 0.03125},
        "path": {},
        "train": {
            "optim_g": {"type": "Adam", "lr": 2e-3},
            "optim_d": {"type": "Adam", "lr": 2e-3},
            "gan_opt": {"type": "GANLoss", "gan_type": "wgan_softplus",
                        "loss_weight": 1.0},
            "r1_reg_weight": 10.0, "path_reg_weight": 2.0,
            "net_g_reg_every": 2, "net_d_reg_every": 2, "mixing_prob": 0.9,
            "path_batch_shrink": 2,
        },
        "val": {"num_val_samples": 2},
    }
    model = build_model(opt)
    state = model.init_state()
    rng = np.random.RandomState(0)
    batch = {"gt": jnp.asarray(rng.rand(2, 16, 16, 3) * 2 - 1, jnp.float32)}
    state, logs1 = model.train_step(state, batch)   # it=1: no reg
    assert float(logs1["l_d_r1"]) == 0.0
    assert float(logs1["l_g_path"]) == 0.0
    mp1 = float(state.extra["mean_path_length"])
    state, logs2 = model.train_step(state, batch)   # it=2: r1 + path reg fire
    assert float(logs2["l_d_r1"]) > 0.0
    assert np.isfinite(float(logs2["l_g_path"]))
    assert float(logs2["path_length"]) > 0.0
    mp2 = float(state.extra["mean_path_length"])
    assert mp1 == 0.0 and mp2 != 0.0
    imgs = model.sample(state, num_samples=2)
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(imgs).all()


def test_hifacegan_model_step():
    opt = {
        "name": "tiny-hiface", "model_type": "HiFaceGANModel", "scale": 4,
        "is_train": True, "manual_seed": 0, "num_gpu": 1,
        "datasets": {"train": {"gt_size": 32}},
        "network_g": {"type": "MSRResNet", "num_in_ch": 3, "num_out_ch": 3,
                      "num_feat": 8, "num_block": 1, "upscale": 4},
        "network_d": {"type": "HiFaceGANDiscriminator", "num_in_ch": 3,
                      "conditional_d": True, "num_d": 2, "n_layers_d": 2,
                      "num_feat": 4},
        "path": {},
        "train": {
            "optim_g": {"type": "Adam", "lr": 1e-3},
            "optim_d": {"type": "Adam", "lr": 1e-3},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "gan_opt": {"type": "MultiScaleGANLoss", "gan_type": "hinge",
                        "loss_weight": 1e-1},
            "feature_matching_opt": {"type": "GANFeatLoss", "criterion": "l1",
                                     "loss_weight": 1.0},
        },
    }
    model = build_model(opt)
    state = model.init_state(lq_shape=(2, 8, 8, 3))
    rng = np.random.RandomState(0)
    batch = {"lq": jnp.asarray(rng.rand(2, 8, 8, 3), jnp.float32),
             "gt": jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)}
    state, logs = model.train_step(state, batch)
    for key in ("l_pix", "l_g_gan", "l_g_feat", "l_d_real", "l_d_fake"):
        assert np.isfinite(float(logs[key])), key
    state, logs = model.train_step(state, batch)
    assert np.isfinite(float(logs["l_g_feat"]))


def test_video_validation_protocol(tmp_path):
    """Per-folder averaging (reference video_base_model.py:118-141) over a
    tiny on-disk VideoTestDataset in windowed mode."""
    import cv2

    lq_root, gt_root = tmp_path / "lq", tmp_path / "gt"
    rng = np.random.RandomState(0)
    for clip in ("clipA", "clipB"):
        (lq_root / clip).mkdir(parents=True)
        (gt_root / clip).mkdir(parents=True)
        for i in range(3):
            cv2.imwrite(str(lq_root / clip / f"{i:08d}.png"),
                        rng.randint(0, 255, (8, 8, 3), np.uint8))
            cv2.imwrite(str(gt_root / clip / f"{i:08d}.png"),
                        rng.randint(0, 255, (32, 32, 3), np.uint8))

    from ssl_tpu.data import build_dataloader, build_dataset
    ds_opt = {"name": "vid-test", "type": "VideoTestDataset",
              "dataroot_gt": str(gt_root), "dataroot_lq": str(lq_root),
              "num_frame": 5, "padding": "reflection", "phase": "val",
              "batch_size_per_gpu": 1, "num_worker_per_gpu": 0, "scale": 4}
    ds = build_dataset(ds_opt)
    assert len(ds) == 6
    item = ds[0]
    assert item["lq"].shape == (5, 8, 8, 3)
    assert item["idx"] == "0/3"
    assert item["border"] == 1

    opt = _edvr_opt()
    opt["is_train"] = False
    opt["path"] = {"visualization": str(tmp_path / "vis")}
    model = build_model(opt)
    state = model.init_state(lq_shape=model.train_init_shape(1, 8))
    loader = build_dataloader(ds, ds_opt)
    avg = model.validation(state, loader, current_iter=1)
    assert "psnr" in avg and np.isfinite(avg["psnr"])


def test_video_recurrent_test_dataset(tmp_path):
    import cv2

    lq_root, gt_root = tmp_path / "lq", tmp_path / "gt"
    rng = np.random.RandomState(0)
    (lq_root / "clipA").mkdir(parents=True)
    (gt_root / "clipA").mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(lq_root / "clipA" / f"{i:08d}.png"),
                    rng.randint(0, 255, (8, 8, 3), np.uint8))
        cv2.imwrite(str(gt_root / "clipA" / f"{i:08d}.png"),
                    rng.randint(0, 255, (32, 32, 3), np.uint8))
    from ssl_tpu.data import build_dataset
    ds = build_dataset({"name": "v", "type": "VideoRecurrentTestDataset",
                        "dataroot_gt": str(gt_root), "dataroot_lq": str(lq_root),
                        "phase": "val", "scale": 4})
    assert len(ds) == 1
    item = ds[0]
    assert item["lq"].shape == (4, 8, 8, 3)
    assert item["gt"].shape == (4, 32, 32, 3)
    assert item["folder"] == "clipA"


def test_generate_frame_indices_parity():
    """All 4 padding modes vs the reference's own function."""
    from ref_loader import ref_module
    ref = ref_module("basicsr.data.data_util")
    from ssl_tpu.data.data_util import generate_frame_indices
    for pad in ("replicate", "reflection", "reflection_circle", "circle"):
        for crt in (0, 1, 4, 8, 9):
            ours = generate_frame_indices(crt, 10, 5, pad)
            theirs = ref.generate_frame_indices(crt, 10, 5, pad)
            assert ours == theirs, (pad, crt, ours, theirs)
