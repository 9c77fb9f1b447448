"""Round-5 video/CFW dataset coverage: the five reference dataset classes
that were missing from the registry (VERDICT r4 #2), plus a live
registry-name diff against the reference's own source so the gap can never
silently reopen.

Reference: Diffusion-Based-SR/basicsr/data/{reds_dataset.py:209,
vimeo90k_dataset.py:137, video_test_dataset.py:134+202,
single_image_dataset.py:76} and data_util.py:314-362 (duf_downsample)."""

import os

import numpy as np
import pytest

from ssl_tpu.data import build_dataset
from ssl_tpu.utils.registry import DATASET_REGISTRY


def _write_png(path, arr):
    import cv2
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    cv2.imwrite(str(path), arr)


def _make_clip_tree(root, clips, n_frames, size, seed=0):
    rng = np.random.RandomState(seed)
    for clip in clips:
        for i in range(n_frames):
            _write_png(os.path.join(str(root), clip, f"{i:08d}.png"),
                       rng.randint(0, 255, (size, size, 3), np.uint8))


# ---------------------------------------------------------------- REDS


def _reds_opt(tmp_path, clips=("000", "001", "002"), n=8, **extra):
    lq_root, gt_root = tmp_path / "lq", tmp_path / "gt"
    _make_clip_tree(lq_root, clips, n, 8)
    _make_clip_tree(gt_root, clips, n, 32)
    meta = tmp_path / "meta.txt"
    meta.write_text("".join(f"{c} {n} (32,32,3)\n" for c in clips))
    return {"name": "reds-rec", "type": "REDSRecurrentDataset",
            "dataroot_gt": str(gt_root), "dataroot_lq": str(lq_root),
            "meta_info_file": str(meta), "num_frame": 3, "gt_size": 16,
            "scale": 4, "val_partition": "REDS4", "use_hflip": False,
            "use_rot": False, **extra}


def test_reds_recurrent_dataset_shapes(tmp_path):
    ds = build_dataset(_reds_opt(tmp_path))
    # '000' is in the REDS4 val partition -> excluded in train mode
    assert len(ds) == 16
    item = ds[0]
    assert item["lq"].shape == (3, 4, 4, 3)
    assert item["gt"].shape == (3, 16, 16, 3)
    assert item["key"].split("/")[0] in ("001", "002")


def test_reds_recurrent_window_consecutive(tmp_path):
    """Window start is re-rolled so [start, start+t) always fits the clip
    (reference reds_dataset.py:303-308) — every index must be readable."""
    ds = build_dataset(_reds_opt(tmp_path))
    for i in range(len(ds)):
        item = ds[i]
        assert np.isfinite(item["lq"]).all()


def test_reds_recurrent_partitions(tmp_path):
    ds_test = build_dataset(_reds_opt(tmp_path, test_mode=True))
    assert len(ds_test) == 8  # only clip 000
    assert all(ds_test.keys[i].startswith("000/") for i in range(8))
    with pytest.raises(ValueError):
        build_dataset(_reds_opt(tmp_path, val_partition="bogus"))
    ds_off = build_dataset(_reds_opt(tmp_path, val_partition="official"))
    assert len(ds_off) == 24  # no clip in [240, 270)


# ---------------------------------------------------------------- Vimeo90K


def _vimeo_tree(tmp_path, keys=("00001/0001", "00001/0002")):
    lq_root, gt_root = tmp_path / "lq", tmp_path / "gt"
    rng = np.random.RandomState(0)
    for key in keys:
        for i in range(1, 8):
            _write_png(os.path.join(str(lq_root), key, f"im{i}.png"),
                       rng.randint(0, 255, (8, 8, 3), np.uint8))
            _write_png(os.path.join(str(gt_root), key, f"im{i}.png"),
                       rng.randint(0, 255, (32, 32, 3), np.uint8))
    meta = tmp_path / "meta.txt"
    meta.write_text("".join(f"{k} 7 (32,32,3)\n" for k in keys))
    return lq_root, gt_root, meta


def test_vimeo90k_recurrent_dataset(tmp_path):
    lq_root, gt_root, meta = _vimeo_tree(tmp_path)
    opt = {"name": "v90k-rec", "type": "Vimeo90KRecurrentDataset",
           "dataroot_gt": str(gt_root), "dataroot_lq": str(lq_root),
           "meta_info_file": str(meta), "gt_size": 16, "scale": 4,
           "use_hflip": False, "use_rot": False, "flip_sequence": False}
    ds = build_dataset(opt)
    assert len(ds) == 2
    item = ds[0]
    assert item["lq"].shape == (7, 4, 4, 3)
    assert item["gt"].shape == (7, 16, 16, 3)

    ds_flip = build_dataset({**opt, "flip_sequence": True})
    item = ds_flip[0]
    assert item["lq"].shape == (14, 4, 4, 3)
    # the appended half is the temporal reverse (reference :189-191)
    np.testing.assert_array_equal(item["lq"][7:], item["lq"][:7][::-1])
    np.testing.assert_array_equal(item["gt"][7:], item["gt"][:7][::-1])


def test_video_test_vimeo90k_dataset(tmp_path):
    lq_root, gt_root, meta = _vimeo_tree(tmp_path)
    ds = build_dataset({"name": "vimeo90k", "type": "VideoTestVimeo90KDataset",
                        "dataroot_gt": str(gt_root), "dataroot_lq": str(lq_root),
                        "meta_info_file": str(meta), "num_frame": 7, "scale": 4})
    assert len(ds) == 2
    item = ds[1]
    assert item["lq"].shape == (7, 8, 8, 3)
    assert item["gt"].shape == (32, 32, 3)
    assert item["folder"] == "vimeo90k"
    assert item["idx"] == "1/2"
    assert item["border"] == 0
    assert item["lq_path"].endswith("im4.png")
    # num_frame 5 window is centred: im2..im6 (reference :161)
    ds5 = build_dataset({"name": "vimeo90k", "type": "VideoTestVimeo90KDataset",
                         "dataroot_gt": str(gt_root), "dataroot_lq": str(lq_root),
                         "meta_info_file": str(meta), "num_frame": 5, "scale": 4})
    assert ds5.neighbor_list == [2, 3, 4, 5, 6]
    assert ds5[0]["lq"].shape == (5, 8, 8, 3)


# ---------------------------------------------------------------- DUF


def test_duf_downsample_oracle():
    """Our numpy duf_downsample == the reference's torch implementation
    (Diffusion-Based-SR data_util.py:332-362, executed as the oracle)."""
    import torch
    from ref_loader import ref_module

    ref_util = ref_module("basicsr.data.data_util")
    from ssl_tpu.data.data_util import duf_downsample

    rng = np.random.RandomState(0)
    for scale in (2, 3, 4):
        x = rng.rand(2, 3, 36, 40).astype(np.float32)  # t,c,h,w for the ref
        ref = ref_util.duf_downsample(torch.from_numpy(x), kernel_size=13,
                                      scale=scale).numpy()
        ours = duf_downsample(x.transpose(0, 2, 3, 1), kernel_size=13,
                              scale=scale).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_video_test_duf_dataset(tmp_path):
    gt_root = tmp_path / "gt"
    _make_clip_tree(gt_root, ("clipA",), 5, 32)
    opt = {"name": "duf-test", "type": "VideoTestDUFDataset",
           "dataroot_gt": str(gt_root), "dataroot_lq": str(tmp_path / "nolq"),
           "num_frame": 3, "padding": "reflection", "scale": 4,
           "use_duf_downsampling": True, "cache_data": False}
    ds = build_dataset(opt)
    assert len(ds) == 5
    item = ds[0]
    assert item["lq"].shape == (3, 8, 8, 3)
    assert item["gt"].shape == (32, 32, 3)
    assert item["border"] == 1
    assert ds[2]["border"] == 0
    # LQ really is the Gaussian downsample of the GT window
    from ssl_tpu.data.data_util import duf_downsample, generate_frame_indices
    from ssl_tpu.utils.img_util import img2array, imread
    sel = generate_frame_indices(0, 5, 3, "reflection")
    gts = np.stack([img2array(imread(str(gt_root / "clipA" / f"{i:08d}.png")))
                    for i in sel])
    np.testing.assert_allclose(item["lq"], duf_downsample(gts, 13, 4), atol=1e-6)


def test_video_test_duf_dataset_real_lq(tmp_path):
    lq_root, gt_root = tmp_path / "lq", tmp_path / "gt"
    _make_clip_tree(lq_root, ("clipA",), 4, 8)
    _make_clip_tree(gt_root, ("clipA",), 4, 32)
    ds = build_dataset({"name": "duf-test", "type": "VideoTestDUFDataset",
                        "dataroot_gt": str(gt_root), "dataroot_lq": str(lq_root),
                        "num_frame": 3, "padding": "reflection", "scale": 4,
                        "use_duf_downsampling": False, "cache_data": False})
    item = ds[1]
    assert item["lq"].shape == (3, 8, 8, 3)
    assert item["gt"].shape == (32, 32, 3)


# ---------------------------------------------------------------- CFW NP


def test_single_image_np_dataset(tmp_path):
    import cv2
    rng = np.random.RandomState(0)
    root = tmp_path / "dump"
    for sub in ("gts", "inputs", "samples"):
        os.makedirs(root / sub)
    os.makedirs(root / "latents")
    for i in range(3):
        for sub in ("gts", "inputs", "samples"):
            cv2.imwrite(str(root / sub / f"{i:03d}.png"),
                        rng.randint(0, 255, (16, 16, 3), np.uint8))
    # one latent per stored layout: ours (h,w,c), reference (1,c,h,w), plain chw
    np.save(root / "latents" / "000.npy", rng.rand(2, 2, 4).astype(np.float32))
    np.save(root / "latents" / "001.npy", rng.rand(1, 4, 2, 2).astype(np.float32))
    np.save(root / "latents" / "002.npy", rng.rand(4, 2, 2).astype(np.float32))

    ds = build_dataset({"name": "cfw", "type": "SingleImageNPDataset",
                        "gt_path": str(root), "io_backend": {"type": "disk"}})
    assert len(ds) == 3
    for i in range(3):
        item = ds[i]
        assert item["latent"].shape == (2, 2, 4), i  # always HWC out
        for k in ("lq", "gt", "sample"):
            assert item[k].shape == (16, 16, 3)
        assert item["gt_path"].endswith(f"{i:03d}.png")

    # list-of-roots concatenation (reference :107-117)
    ds2 = build_dataset({"name": "cfw", "type": "SingleImageNPDataset",
                         "gt_path": [str(root), str(root)],
                         "io_backend": {"type": "disk"}})
    assert len(ds2) == 6

    # mean/std normalization
    ds3 = build_dataset({"name": "cfw", "type": "SingleImageNPDataset",
                         "gt_path": str(root), "io_backend": {"type": "disk"},
                         "mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5]})
    raw, normed = ds[0]["gt"], ds3[0]["gt"]
    np.testing.assert_allclose(normed, (raw - 0.5) / 0.5, atol=1e-6)


# ------------------------------------------------------- registry diff


def _ref_registered(patterns, registry_name):
    import glob as _glob
    import re
    names = set()
    for pattern in patterns:
        for f in _glob.glob(pattern):
            src = open(f).read()
            for m in re.finditer(
                    r"@%s\.register\(\)\s*\n(?:class|def)\s+(\w+)" % registry_name,
                    src):
                names.add(m.group(1))
    return names


def test_dataset_registry_covers_reference():
    """Every dataset class the reference's two basicsr trees register must
    resolve here (VERDICT r4 #2 done-criterion)."""
    ref = _ref_registered(["/root/reference/*/basicsr/data/*.py"],
                          "DATASET_REGISTRY")
    assert ref, "reference scan found nothing — pattern broken?"
    missing = sorted(n for n in ref if n not in DATASET_REGISTRY)
    assert not missing, f"reference-registered datasets missing here: {missing}"


def test_arch_registry_covers_reference():
    import ssl_tpu.archs  # noqa: F401  (populates the registry)
    from ssl_tpu.utils.registry import ARCH_REGISTRY

    ref = _ref_registered(["/root/reference/*/basicsr/archs/*.py"],
                          "ARCH_REGISTRY")
    assert ref
    missing = sorted(n for n in ref if n not in ARCH_REGISTRY)
    assert not missing, f"reference-registered archs missing here: {missing}"


def test_model_loss_metric_registries_cover_reference():
    """Same live diff for the other three registries (MODEL/LOSS/METRIC —
    round 5 closed ClipLoss / PerceptualSimLoss / calculate_*_pt)."""
    import ssl_tpu.losses  # noqa: F401
    import ssl_tpu.metrics  # noqa: F401
    import ssl_tpu.models  # noqa: F401
    from ssl_tpu.utils.registry import (
        LOSS_REGISTRY, METRIC_REGISTRY, MODEL_REGISTRY,
    )

    for patterns, reg_name, reg in [
            (["/root/reference/*/basicsr/models/*.py"], "MODEL_REGISTRY",
             MODEL_REGISTRY),
            (["/root/reference/*/basicsr/losses/*.py"], "LOSS_REGISTRY",
             LOSS_REGISTRY),
            (["/root/reference/*/basicsr/metrics/*.py"], "METRIC_REGISTRY",
             METRIC_REGISTRY)]:
        ref = _ref_registered(patterns, reg_name)
        assert ref, reg_name
        missing = sorted(n for n in ref if n not in reg)
        assert not missing, f"{reg_name} missing here: {missing}"


# --------------------------------------- recurrent model fed by the dataset


@pytest.mark.slow
def test_video_recurrent_model_from_reds_recurrent(tmp_path):
    """2 training steps of VideoRecurrentModel fed by REDSRecurrentDataset
    fixtures through the real dataloader (VERDICT r4 #2)."""
    import jax.numpy as jnp

    from ssl_tpu.data import build_dataloader
    from ssl_tpu.models import build_model

    # SpyNet needs >= 64 px lq after its 32-multiple round-up
    lq_root, gt_root = tmp_path / "lq", tmp_path / "gt"
    _make_clip_tree(lq_root, ("001",), 6, 64)
    _make_clip_tree(gt_root, ("001",), 6, 256)
    meta = tmp_path / "meta.txt"
    meta.write_text("001 6 (256,256,3)\n")
    ds_opt = {"name": "reds-rec", "type": "REDSRecurrentDataset",
              "dataroot_gt": str(gt_root), "dataroot_lq": str(lq_root),
              "meta_info_file": str(meta), "num_frame": 3, "gt_size": 256,
              "scale": 4, "val_partition": "REDS4", "use_hflip": False,
              "use_rot": False, "phase": "train", "batch_size_per_gpu": 2,
              "num_worker_per_gpu": 0}
    ds = build_dataset(ds_opt)
    loader = build_dataloader(ds, ds_opt)
    opt = {
        "name": "tiny-recurrent", "model_type": "VideoRecurrentModel",
        "scale": 4, "is_train": True, "manual_seed": 0, "num_gpu": 1,
        "datasets": {"train": ds_opt},
        "network_g": {"type": "BasicVSR", "num_feat": 8, "num_block": 1},
        "path": {},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-3},
                  "pixel_opt": {"type": "CharbonnierLoss", "loss_weight": 1.0,
                                "eps": 1e-12},
                  "fix_flow": 1, "flow_lr_mul": 0.125},
    }
    model = build_model(opt)
    state = model.init_state(lq_shape=(2, 3, 64, 64, 3))
    it = iter(loader)
    losses = []
    for _ in range(2):
        batch = next(it)
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k in ("lq", "gt")}
        assert batch["lq"].shape == (2, 3, 64, 64, 3)
        assert batch["gt"].shape == (2, 3, 256, 256, 3)
        state, logs = model.train_step(state, batch)
        losses.append(float(logs["l_pix"]))
    assert all(np.isfinite(v) for v in losses)
