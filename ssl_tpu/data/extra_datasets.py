"""Remaining dataset family members (reference parity, SURVEY §2.4).

- RealESRGANPairedDataset (realesrgan_paired_dataset.py): paired w/ meta file
- FFHQDataset (ffhq_dataset.py): faces, GT-only
- TwoStageDegradationDF2KDataset (twostagedegradation_df2k_dataset.py):
  offline 2-stage degraded pairs produced at load time
- TwoStageDegradation_Img_Mask_Dataset (diffusion tree,
  twostagedegradation_img_mask_dataset.py:19-119): multi-root GT list +
  optional FFHQ face subset, filename<->mask assertion, 512-crop, per-sample
  kernels — feeds the StableSR-SSL loop."""

from __future__ import annotations

import os
import random

import numpy as np

from ssl_tpu.data.data_util import paired_paths_from_meta_info_file, paths_from_folder
from ssl_tpu.data.paired_image_dataset import BaseDataset, load_mask
from ssl_tpu.data.realesrgan_dataset import _KernelSynth
from ssl_tpu.data.transforms import augment, paired_random_crop
from ssl_tpu.utils.img_util import img2array, imread
from ssl_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class RealESRGANPairedDataset(BaseDataset):
    def __init__(self, opt: dict):
        self.opt = opt
        self.scale = opt.get("scale", 4)
        self.paths = paired_paths_from_meta_info_file(
            [opt["dataroot_lq"], opt["dataroot_gt"]], ["lq", "gt"],
            opt["meta_info"], opt.get("filename_tmpl", "{}")) \
            if opt.get("meta_info") else None
        if self.paths is None:
            from ssl_tpu.data.data_util import paired_paths_from_folders
            self.paths = paired_paths_from_folders(
                [opt["dataroot_lq"], opt["dataroot_gt"]], ["lq", "gt"],
                opt.get("filename_tmpl", "{}"))
        self.phase = opt.get("phase", "train")
        self.gt_size = opt.get("gt_size")

    def __getitem__(self, index):
        d = self.paths[index]
        img_gt = img2array(imread(d["gt_path"]))
        img_lq = img2array(imread(d["lq_path"]))
        if self.phase == "train":
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, self.gt_size, self.scale)
            img_gt, img_lq = augment([img_gt, img_lq], self.opt.get("use_hflip", True),
                                     self.opt.get("use_rot", True))
        return {"lq": img_lq, "gt": img_gt, "lq_path": d["lq_path"], "gt_path": d["gt_path"]}


@DATASET_REGISTRY.register()
class FFHQDataset(BaseDataset):
    """GT-only faces (reference ffhq_dataset.py)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.paths = paths_from_folder(opt["dataroot_gt"])
        self.mean = opt.get("mean")
        self.std = opt.get("std")

    def __getitem__(self, index):
        img = img2array(imread(self.paths[index]))
        img = augment(img, self.opt.get("use_hflip", True), False)
        if self.mean is not None:
            img = (img - np.asarray(self.mean)) / np.asarray(self.std)
        return {"gt": img, "gt_path": self.paths[index]}


@DATASET_REGISTRY.register()
class TwoStageDegradationDF2KDataset(BaseDataset):
    """GT + on-load two-stage degraded LQ (offline flavor of the RealESRGAN
    pipeline, reference twostagedegradation_df2k_dataset.py)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.scale = opt.get("scale", 4)
        self.paths = paths_from_folder(opt["dataroot_gt"])
        self.gt_size = opt.get("gt_size", 256)
        self.synth = _KernelSynth(opt)
        from ssl_tpu.data.realesr_degradation import RealESRGANDegrader
        self.degrader = RealESRGANDegrader(opt, scale=self.scale, queue_size=0)
        self.degrader.pool = None

    def __getitem__(self, index):
        img_gt = img2array(imread(self.paths[index]))
        h, w = img_gt.shape[:2]
        size = self.gt_size
        top = random.randint(0, max(h - size, 0))
        left = random.randint(0, max(w - size, 0))
        img_gt = img_gt[top:top + size, left:left + size]
        img_gt = augment(img_gt, self.opt.get("use_hflip", True), self.opt.get("use_rot", True))
        k1, k2, sinc = self.synth.sample()
        lq = self.degrader.degrade_batch(img_gt[None], [k1], [k2], [sinc])[0]
        return {"gt": img_gt, "lq": lq, "gt_path": self.paths[index]}


@DATASET_REGISTRY.register()
class TwoStageDegradationImgMaskDataset(BaseDataset):
    """Diffusion-tree training set: multi-root GT + masks + per-sample kernels
    (reference twostagedegradation_img_mask_dataset.py:19-119).  Returns
    GT crop + mask + kernels; pixel degradation happens in the batch pipeline."""

    def __init__(self, opt: dict):
        self.opt = opt
        gt_roots = opt["dataroot_gt"]
        if isinstance(gt_roots, str):
            gt_roots = [gt_roots]
        mask_roots = opt["dataroot_gt_mask"]
        if isinstance(mask_roots, str):
            mask_roots = [mask_roots] * len(gt_roots)
        self.items = []
        for groot, mroot in zip(gt_roots, mask_roots):
            for p in paths_from_folder(groot):
                self.items.append((p, mroot))
        face_root = opt.get("face_gt_path")
        if face_root:
            face_paths = paths_from_folder(face_root)
            num_face = opt.get("num_face")
            if num_face:
                face_paths = face_paths[:num_face]
            for p in face_paths:
                self.items.append((p, opt.get("face_mask_path", mask_roots[0])))
        self.paths = [p for p, _ in self.items]
        self.crop_size = opt.get("crop_size", 512)
        self.synth = _KernelSynth(opt)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index):
        gt_path, mask_root = self.items[index]
        img_gt = img2array(imread(gt_path))
        base = os.path.splitext(os.path.basename(gt_path))[0]
        mask = None
        for ext in (".mat", ".npy", ".png"):
            cand = os.path.join(mask_root, base + ext)
            if os.path.exists(cand):
                mask = load_mask(cand)[..., None]
                break
        if mask is None:
            raise FileNotFoundError(
                f"mask for {base} not found in {mask_root} (the reference asserts "
                "filename<->mask correspondence)")
        assert mask.shape[:2] == img_gt.shape[:2], (
            f"mask/GT size mismatch for {base}: {mask.shape} vs {img_gt.shape}")
        h, w = img_gt.shape[:2]
        size = min(self.crop_size, h, w)
        top = random.randint(0, h - size)
        left = random.randint(0, w - size)
        img_gt = img_gt[top:top + size, left:left + size]
        mask = mask[top:top + size, left:left + size]
        img_gt, mask = augment([img_gt, mask], self.opt.get("use_hflip", True), False)
        k1, k2, sinc = self.synth.sample()
        return {"gt": img_gt, "gt_mask": mask, "kernel1": k1, "kernel2": k2,
                "sinc_kernel": sinc, "gt_path": gt_path}
