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
@DATASET_REGISTRY.register(name="TwoStageDegradation_DF2K_Dataset")  # reference spelling
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
@DATASET_REGISTRY.register(name="TwoStageDegradation_Img_Mask_Dataset")  # reference spelling
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


@DATASET_REGISTRY.register()
class FFHQDegradationDataset(BaseDataset):
    """FFHQ with on-the-fly GFPGAN-style degradation (reference
    ffhq_degradation_dataset.py:18-243): mixed blur kernel, random
    downsample, gaussian noise, JPEG, resize back, optional color
    jitter / grayscale, mean/std normalization, optional facial-component
    boxes from a precomputed components file."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.paths = paths_from_folder(opt["dataroot_gt"])
        self.mean = np.asarray(opt.get("mean", (0.5, 0.5, 0.5)), np.float32)
        self.std = np.asarray(opt.get("std", (0.5, 0.5, 0.5)), np.float32)
        self.out_size = opt.get("out_size", 512)
        self.kernel_list = opt.get("kernel_list", ("iso", "aniso"))
        self.kernel_prob = opt.get("kernel_prob", (0.5, 0.5))
        self.blur_kernel_size = opt.get("blur_kernel_size", 41)
        self.blur_sigma = opt.get("blur_sigma", (0.1, 10))
        self.downsample_range = opt.get("downsample_range", (0.8, 8))
        self.noise_range = opt.get("noise_range", (0, 20))
        self.jpeg_range = opt.get("jpeg_range", (60, 100))
        self.color_jitter_prob = opt.get("color_jitter_prob")
        self.color_jitter_shift = opt.get("color_jitter_shift", 20) / 255.0
        self.gray_prob = opt.get("gray_prob")
        self.crop_components = opt.get("crop_components", False)
        self.eye_enlarge_ratio = opt.get("eye_enlarge_ratio", 1)
        if self.crop_components:
            import torch
            self.components_list = torch.load(opt["component_path"],
                                              map_location="cpu")

    def _component_coords(self, index, hflipped):
        comp = {k: np.asarray(v, np.float32).copy()
                for k, v in self.components_list[f"{index:08d}"].items()}
        if hflipped:
            comp["left_eye"], comp["right_eye"] = comp["right_eye"], comp["left_eye"]
            for part in ("left_eye", "right_eye", "mouth"):
                comp[part][0] = self.out_size - comp[part][0]
        locs = []
        for part in ("left_eye", "right_eye", "mouth"):
            mean = comp[part][0:2]
            half = comp[part][2] * (self.eye_enlarge_ratio if "eye" in part else 1)
            locs.append(np.hstack([mean - half + 1, mean + half]).astype(np.float32))
        return locs

    def __getitem__(self, index):
        import cv2
        from ssl_tpu.data.degradations import (add_jpg_compression_np,
                                               random_mixed_kernels)
        img_gt = img2array(imread(self.paths[index]))
        hflipped = self.opt.get("use_hflip", True) and random.random() < 0.5
        if hflipped:
            img_gt = img_gt[:, ::-1].copy()
        h, w = img_gt.shape[:2]

        kernel = random_mixed_kernels(self.kernel_list, self.kernel_prob,
                                      self.blur_kernel_size, self.blur_sigma,
                                      self.blur_sigma,
                                      (-np.pi, np.pi), noise_range=None)
        img_lq = cv2.filter2D(img_gt, -1, kernel)
        scale = np.random.uniform(*self.downsample_range)
        img_lq = cv2.resize(img_lq, (int(w // scale), int(h // scale)),
                            interpolation=cv2.INTER_LINEAR)
        if self.noise_range is not None:
            sigma = np.random.uniform(*self.noise_range) / 255.0
            img_lq = img_lq + np.random.randn(*img_lq.shape).astype(np.float32) * sigma
            img_lq = np.clip(img_lq, 0, 1)
        if self.jpeg_range is not None:
            quality = np.random.uniform(*self.jpeg_range)
            img_lq = add_jpg_compression_np(img_lq, quality)
        img_lq = cv2.resize(img_lq.astype(np.float32), (w, h),
                            interpolation=cv2.INTER_LINEAR)
        if self.color_jitter_prob is not None and np.random.uniform() < self.color_jitter_prob:
            jitter = np.random.uniform(-self.color_jitter_shift,
                                       self.color_jitter_shift, 3).astype(np.float32)
            img_lq = np.clip(img_lq + jitter, 0, 1)
        if self.gray_prob and np.random.uniform() < self.gray_prob:
            gray = cv2.cvtColor(img_lq.astype(np.float32), cv2.COLOR_RGB2GRAY)
            img_lq = np.tile(gray[:, :, None], (1, 1, 3))
            if self.opt.get("gt_gray"):
                ggray = cv2.cvtColor(img_gt.astype(np.float32), cv2.COLOR_RGB2GRAY)
                img_gt = np.tile(ggray[:, :, None], (1, 1, 3))
        # round/clip like the reference (quantize to uint8 levels)
        img_lq = np.clip(np.round(img_lq * 255.0), 0, 255) / 255.0
        img_gt = (img_gt - self.mean) / self.std
        img_lq = (img_lq.astype(np.float32) - self.mean) / self.std
        out = {"lq": img_lq.astype(np.float32), "gt": img_gt.astype(np.float32),
               "gt_path": self.paths[index]}
        if self.crop_components:
            le, re, mo = self._component_coords(index, hflipped)
            out.update({"loc_left_eye": le, "loc_right_eye": re, "loc_mouth": mo})
        return out
