"""Paired LQ/GT datasets, with and without edge masks.

Reference parity: data/paired_image_dataset.py, paired_image_mask_dataset.py,
single_image_dataset.py. Numpy HWC float32 RGB outputs (NHWC batches)."""

from __future__ import annotations

import os
import random

import numpy as np

from ssl_tpu.data.data_util import paired_paths_from_folders, paired_paths_from_meta_info_file, paired_paths_with_mask, paths_from_folder
from ssl_tpu.data.transforms import augment, paired_random_crop, paired_random_crop_img_mask
from ssl_tpu.utils.img_util import img2array, imread
from ssl_tpu.utils.registry import DATASET_REGISTRY


def load_mask(path: str) -> np.ndarray:
    """Load a binary edge mask saved as .mat (key 'mat'), .npy or .png
    (reference masks: generate_mask.py saves scipy.io .mat with key 'mat')."""
    if path.endswith(".mat"):
        from scipy.io import loadmat
        m = loadmat(path)["mat"]
    elif path.endswith(".npy"):
        m = np.load(path)
    else:
        import cv2
        m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        m = (m > 127).astype(np.float32)
    m = np.asarray(m).astype(np.float32)
    if m.ndim == 3:
        m = m[..., 0]
    return m


class BaseDataset:
    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register()
class PairedImageDataset(BaseDataset):
    """Classic paired folder/meta dataset (reference paired_image_dataset.py)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.scale = opt.get("scale", 4)
        gt_folder, lq_folder = opt["dataroot_gt"], opt["dataroot_lq"]
        tmpl = opt.get("filename_tmpl", "{}")
        # io_backend (reference paired_image_dataset.py:56-66): 'disk'
        # (default) reads files; 'lmdb' treats the dataroots as .lmdb dirs
        # with meta_info.txt key lists and fetches encoded bytes by key.
        self.io_backend_opt = dict(opt.get("io_backend") or {"type": "disk"})
        self.file_client = None   # built lazily (per dataloader worker)
        if self.io_backend_opt.get("type") == "lmdb":
            from ssl_tpu.data.data_util import paired_paths_from_lmdb
            self.io_backend_opt["db_paths"] = [lq_folder, gt_folder]
            self.io_backend_opt["client_keys"] = ["lq", "gt"]
            self.paths = paired_paths_from_lmdb([lq_folder, gt_folder], ["lq", "gt"])
        elif opt.get("meta_info_file"):
            self.paths = paired_paths_from_meta_info_file(
                [lq_folder, gt_folder], ["lq", "gt"], opt["meta_info_file"], tmpl)
        else:
            self.paths = paired_paths_from_folders([lq_folder, gt_folder], ["lq", "gt"], tmpl)
        self.phase = opt.get("phase", "train")
        self.gt_size = opt.get("gt_size")
        self.use_hflip = opt.get("use_hflip", False)
        self.use_rot = opt.get("use_rot", False)

    def _read(self, path: str, client_key: str) -> "np.ndarray":
        from ssl_tpu.data.file_client import FileClient
        from ssl_tpu.utils.img_util import imfrombytes
        if self.file_client is None:
            kw = dict(self.io_backend_opt)
            self.file_client = FileClient(kw.pop("type"), **kw)
        return imfrombytes(self.file_client.get(path, client_key), float32=True)

    def __getitem__(self, index):
        d = self.paths[index]
        img_gt = img2array(self._read(d["gt_path"], "gt"))
        img_lq = img2array(self._read(d["lq_path"], "lq"))
        if self.phase == "train":
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, self.gt_size, self.scale)
            img_gt, img_lq = augment([img_gt, img_lq], self.use_hflip, self.use_rot)
        else:
            # center-consistent: crop GT to match LQ*scale
            h, w = img_lq.shape[:2]
            img_gt = img_gt[: h * self.scale, : w * self.scale, :]
        return {"lq": img_lq, "gt": img_gt, "lq_path": d["lq_path"], "gt_path": d["gt_path"]}


@DATASET_REGISTRY.register()
class MyPairedImageDataset(PairedImageDataset):
    """Simplified paired dataset used by tests in the reference (my_paired_image_dataset.py)."""


@DATASET_REGISTRY.register()
class PairedImageMaskDataset(BaseDataset):
    """GT + LQ + offline Laplacian edge mask for SSL training
    (reference paired_image_mask_dataset.py:14-98)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.scale = opt.get("scale", 4)
        tmpl = opt.get("filename_tmpl", "{}")
        self.paths = paired_paths_with_mask(
            [opt["dataroot_lq"], opt["dataroot_gt"], opt["dataroot_gt_mask"]],
            ["lq", "gt", "gt_mask"], tmpl)
        self.phase = opt.get("phase", "train")
        self.gt_size = opt.get("gt_size")
        self.use_hflip = opt.get("use_hflip", True)
        self.use_rot = opt.get("use_rot", True)

    def __getitem__(self, index):
        d = self.paths[index]
        img_gt = img2array(imread(d["gt_path"]))
        img_lq = img2array(imread(d["lq_path"]))
        mask = load_mask(d["gt_mask_path"])[..., None]  # HW1
        if self.phase == "train":
            img_gt, img_lq, mask = paired_random_crop_img_mask(
                img_gt, img_lq, mask, self.gt_size, self.scale)
            img_gt, img_lq, mask = augment([img_gt, img_lq, mask], self.use_hflip, self.use_rot)
        return {"lq": img_lq, "gt": img_gt, "gt_mask": mask,
                "lq_path": d["lq_path"], "gt_path": d["gt_path"]}


@DATASET_REGISTRY.register()
class SingleImageDataset(BaseDataset):
    """LQ-only inference dataset (reference single_image_dataset.py)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.paths = paths_from_folder(opt["dataroot_lq"])

    def __getitem__(self, index):
        path = self.paths[index]
        return {"lq": img2array(imread(path)), "lq_path": path}


@DATASET_REGISTRY.register()
class MultiLROneGTDataset(BaseDataset):
    """Several LR variants per GT (reference multiLR_oneGT_dataset.py:1-52):
    dataroot_lq contains one subfolder (or suffix set) per degradation."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.scale = opt.get("scale", 4)
        gt_paths = paths_from_folder(opt["dataroot_gt"])
        lq_root = opt["dataroot_lq"]
        subdirs = sorted(d for d in os.listdir(lq_root) if os.path.isdir(os.path.join(lq_root, d)))
        self.paths = []
        for gt in gt_paths:
            base = os.path.basename(gt)
            for sub in subdirs:
                lq = os.path.join(lq_root, sub, base)
                if os.path.exists(lq):
                    self.paths.append({"gt_path": gt, "lq_path": lq, "variant": sub})

    def __getitem__(self, index):
        d = self.paths[index]
        img_gt = img2array(imread(d["gt_path"]))
        img_lq = img2array(imread(d["lq_path"]))
        h, w = img_lq.shape[:2]
        img_gt = img_gt[: h * self.scale, : w * self.scale, :]
        return {"lq": img_lq, "gt": img_gt, **{k: d[k] for k in ("lq_path", "gt_path", "variant")}}


@DATASET_REGISTRY.register()
class SingleImageNPDataset(BaseDataset):
    """CFW stage-2 training quadruplets (reference
    single_image_dataset.py:76-164): aligned ``{gts,inputs,latents,samples}``
    folders under ``gt_path`` (string or list of roots) as dumped by
    ``scripts/gt_input_output.py``.  Returns HWC float images plus the HWC
    latent — the reference stores ``(1, c, h, w)`` and returns
    ``latent_np[0]``; our dumper stores ``(h, w, c)`` directly, and both
    layouts load here (a leading batch dim is stripped, CHW is transposed)."""

    def __init__(self, opt: dict):
        import glob as _glob

        self.opt = opt
        image_type = opt.get("image_type", "png")
        roots = opt["gt_path"]
        if isinstance(roots, str):
            roots = [roots]
        self.gt_paths, self.lq_paths = [], []
        self.np_paths, self.sample_paths = [], []
        for root in roots:
            def listing(sub, pat):
                return sorted(_glob.glob(os.path.join(root, sub, pat)))
            self.gt_paths += listing("gts", "*." + image_type)
            self.lq_paths += listing("inputs", "*." + image_type)
            self.np_paths += listing("latents", "*.npy")
            self.sample_paths += listing("samples", "*." + image_type)
        assert len(self.gt_paths) == len(self.lq_paths) == len(self.np_paths) \
            == len(self.sample_paths), "gts/inputs/latents/samples must align"
        self.mean = opt.get("mean")
        self.std = opt.get("std")

    def __len__(self):
        return len(self.gt_paths)

    def _norm(self, img):
        if self.mean is not None or self.std is not None:
            mean = np.asarray(self.mean if self.mean is not None else 0.0, np.float32)
            std = np.asarray(self.std if self.std is not None else 1.0, np.float32)
            img = (img - mean) / std
        return img

    def __getitem__(self, index):
        lq = img2array(imread(self.lq_paths[index]))
        gt = img2array(imread(self.gt_paths[index]))
        sample = img2array(imread(self.sample_paths[index]))
        latent = np.load(self.np_paths[index]).astype(np.float32)
        if latent.ndim == 4:
            latent = latent[0]
        if latent.shape[0] in (3, 4) and latent.shape[-1] not in (3, 4):
            latent = latent.transpose(1, 2, 0)  # CHW (reference dump) -> HWC
        if self.opt.get("color") == "y":
            from ssl_tpu.utils.color_util import rgb2ycbcr
            lq, gt, sample = (rgb2ycbcr(v, y_only=True)[..., None]
                              for v in (lq, gt, sample))
        return {"lq": self._norm(lq), "lq_path": self.lq_paths[index],
                "gt": self._norm(gt), "gt_path": self.gt_paths[index],
                "latent": latent, "latent_path": self.np_paths[index],
                "sample": self._norm(sample),
                "sample_path": self.sample_paths[index]}
