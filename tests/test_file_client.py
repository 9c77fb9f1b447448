"""File-client backends + lmdb dataset plumbing (reference: data/file_client.py
and tests/test_data/test_paired_image_dataset.py's lmdb path).

The image ships without the optional `lmdb` package, so the LMDB test runs
the full round trip when the package exists and otherwise pins the
documented ImportError gate; the disk/memory backends and the .lmdb
meta_info key listing are exercised for real either way.
"""

from __future__ import annotations

import os

import cv2
import numpy as np
import pytest

from ssl_tpu.data.data_util import paired_paths_from_lmdb
from ssl_tpu.data.file_client import FileClient
from ssl_tpu.data.paired_image_dataset import PairedImageDataset


def _write_pngs(root, names, size, seed=0):
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    for n in names:
        cv2.imwrite(os.path.join(root, n + ".png"),
                    (rng.rand(size, size, 3) * 255).astype(np.uint8))


def _fake_lmdb_dir(path, names):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta_info.txt"), "w") as f:
        for n in names:
            f.write(f"{n}.png (16,16,3) 1\n")


def test_paired_paths_from_lmdb_listing(tmp_path):
    lq = str(tmp_path / "lq.lmdb")
    gt = str(tmp_path / "gt.lmdb")
    _fake_lmdb_dir(lq, ["b", "a"])
    _fake_lmdb_dir(gt, ["a", "b"])
    paths = paired_paths_from_lmdb([lq, gt], ["lq", "gt"])
    assert paths == [{"lq_path": "a", "gt_path": "a"},
                     {"lq_path": "b", "gt_path": "b"}]
    with pytest.raises(ValueError, match="lmdb"):
        paired_paths_from_lmdb([str(tmp_path / "plain"), gt], ["lq", "gt"])
    _fake_lmdb_dir(str(tmp_path / "other.lmdb"), ["a", "c"])
    with pytest.raises(ValueError, match="different"):
        paired_paths_from_lmdb([str(tmp_path / "other.lmdb"), gt], ["lq", "gt"])


def test_paired_dataset_disk_via_file_client(tmp_path):
    """The dataset now routes reads through FileClient; disk backend output
    is byte-identical to the old direct imread path."""
    gt_dir, lq_dir = str(tmp_path / "gt"), str(tmp_path / "lq")
    _write_pngs(gt_dir, ["x", "y"], 32, seed=0)
    _write_pngs(lq_dir, ["x", "y"], 8, seed=1)
    ds = PairedImageDataset({"dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
                             "phase": "val", "scale": 4})
    item = ds[0]
    from ssl_tpu.utils.img_util import img2array, imread
    ref = img2array(imread(item["gt_path"]))
    np.testing.assert_array_equal(item["gt"], ref)


def test_paired_dataset_memory_backend(tmp_path):
    gt_dir, lq_dir = str(tmp_path / "gt"), str(tmp_path / "lq")
    _write_pngs(gt_dir, ["x"], 32, seed=2)
    _write_pngs(lq_dir, ["x"], 8, seed=3)
    store = {}
    for d in (gt_dir, lq_dir):
        p = os.path.join(d, "x.png")
        with open(p, "rb") as f:
            store[p] = f.read()
    ds = PairedImageDataset({"dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
                             "phase": "val", "scale": 4,
                             "io_backend": {"type": "memory", "store": store}})
    item = ds[0]
    assert item["gt"].shape == (32, 32, 3) and item["lq"].shape == (8, 8, 3)


def test_reds_dataset_disk_and_lmdb_key_path(tmp_path):
    """REDS window sampling reads through the io_backend: disk end-to-end;
    the lmdb branch addresses frames by '<clip>/<frame:08d>' keys (gate when
    the optional package is absent, real round trip when present)."""
    from ssl_tpu.data.video_datasets import REDSDataset

    gt_root, lq_root = str(tmp_path / "gt"), str(tmp_path / "lq")
    for i in range(100):
        _write_pngs(os.path.join(gt_root, "000"), [f"{i:08d}"], 32, seed=i)
        _write_pngs(os.path.join(lq_root, "000"), [f"{i:08d}"], 8, seed=100 + i)
    meta = str(tmp_path / "meta.txt")
    with open(meta, "w") as f:
        f.write("000 100 (32,32,3)\n")
    opt = {"dataroot_gt": gt_root, "dataroot_lq": lq_root,
           "meta_info_file": meta, "num_frame": 3, "scale": 4, "gt_size": 16,
           "val_partition": [], "use_hflip": False, "use_rot": False}
    ds = REDSDataset(opt)
    item = ds[50]
    assert item["lq"].shape == (3, 4, 4, 3) and item["gt"].shape == (16, 16, 3)

    try:
        import lmdb  # noqa: F401
    except ImportError:
        ds2 = REDSDataset({**opt, "dataroot_gt": gt_root + ".lmdb",
                           "dataroot_lq": lq_root + ".lmdb",
                           "io_backend": {"type": "lmdb"}})
        with pytest.raises(ImportError, match="lmdb"):
            ds2[50]
        return
    from ssl_tpu.utils.lmdb_util import make_lmdb_from_imgs
    for root, size in ((gt_root, 32), (lq_root, 8)):
        names = [f"000/{i:08d}" for i in range(100)]
        make_lmdb_from_imgs(root, root + ".lmdb",
                            [f"000/{i:08d}.png" for i in range(100)], names)
    ds2 = REDSDataset({**opt, "dataroot_gt": gt_root + ".lmdb",
                       "dataroot_lq": lq_root + ".lmdb",
                       "io_backend": {"type": "lmdb"}})
    item2 = ds2[50]
    assert item2["gt"].shape == (16, 16, 3)


def test_lmdb_backend_roundtrip_or_gate(tmp_path):
    names = ["a", "b"]
    gt_dir, lq_dir = str(tmp_path / "gt"), str(tmp_path / "lq")
    _write_pngs(gt_dir, names, 32, seed=4)
    _write_pngs(lq_dir, names, 8, seed=5)
    try:
        import lmdb  # noqa: F401
        have_lmdb = True
    except ImportError:
        have_lmdb = False

    if not have_lmdb:
        with pytest.raises(ImportError, match="lmdb"):
            FileClient("lmdb", db_paths=[str(tmp_path / "x.lmdb")],
                       client_keys=["lq"])
        # dataset construction (path listing) works without the package;
        # only the first read needs it
        lqdb, gtdb = str(tmp_path / "lq.lmdb"), str(tmp_path / "gt.lmdb")
        _fake_lmdb_dir(lqdb, names)
        _fake_lmdb_dir(gtdb, names)
        ds = PairedImageDataset({"dataroot_gt": gtdb, "dataroot_lq": lqdb,
                                 "phase": "val", "scale": 4,
                                 "io_backend": {"type": "lmdb"}})
        assert len(ds) == 2
        with pytest.raises(ImportError, match="lmdb"):
            ds[0]
        return

    from ssl_tpu.utils.lmdb_util import make_lmdb_from_imgs
    lqdb, gtdb = str(tmp_path / "lq.lmdb"), str(tmp_path / "gt.lmdb")
    make_lmdb_from_imgs(lq_dir, lqdb, [n + ".png" for n in names], names)
    make_lmdb_from_imgs(gt_dir, gtdb, [n + ".png" for n in names], names)
    ds = PairedImageDataset({"dataroot_gt": gtdb, "dataroot_lq": lqdb,
                             "phase": "val", "scale": 4,
                             "io_backend": {"type": "lmdb"}})
    from ssl_tpu.utils.img_util import img2array, imread
    item = ds[0]
    np.testing.assert_array_equal(
        item["gt"], img2array(imread(os.path.join(gt_dir, "a.png"))))
