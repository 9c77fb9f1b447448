"""DatasetBlindSRMask — KAIR/BSRGAN-SSL training dataset.

Reference parity: train_BSGRAN/data/dataset_blindsrmask.py: GT + .mat edge
mask are randomly cropped to H_size together (:62-67), augmented, then run
through the BSRGAN shuffled degradation (utils_blindsr.py:443-530) producing
(L, H, mask) with H_size == lq_patchsize*sf (invariant asserted downstream)."""

from __future__ import annotations

import os
import random

import numpy as np

from ssl_tpu.data.bsrgan_degradation import degradation_bsrgan
from ssl_tpu.data.data_util import paths_from_folder
from ssl_tpu.data.paired_image_dataset import BaseDataset, load_mask
from ssl_tpu.data.transforms import augment
from ssl_tpu.utils.img_util import img2array, imread
from ssl_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class DatasetBlindSRMask(BaseDataset):

    def __init__(self, opt: dict):
        self.opt = opt
        self.scale = opt.get("scale", 4)
        self.h_size = opt.get("H_size", opt.get("gt_size", 256))
        self.lq_patchsize = self.h_size // self.scale
        self.paths = paths_from_folder(opt["dataroot_gt"] if "dataroot_gt" in opt
                                       else opt["dataroot_H"])
        self.mask_root = opt.get("dataroot_gt_mask") or opt.get("dataroot_mask")
        self.phase = opt.get("phase", "train")
        self.use_hflip = opt.get("use_hflip", True)
        self.use_rot = opt.get("use_rot", True)

    def __getitem__(self, index):
        gt_path = self.paths[index]
        img_gt = img2array(imread(gt_path))
        base = os.path.splitext(os.path.basename(gt_path))[0]
        mask = None
        if self.mask_root:
            for ext in (".mat", ".npy", ".png"):
                cand = os.path.join(self.mask_root, base + ext)
                if os.path.exists(cand):
                    mask = load_mask(cand)[..., None]
                    break
            if mask is None:
                raise FileNotFoundError(f"no mask for {base} in {self.mask_root}")

        if self.phase == "train":
            h, w = img_gt.shape[:2]
            top = random.randint(0, max(h - self.h_size, 0))
            left = random.randint(0, max(w - self.h_size, 0))
            img_gt = img_gt[top:top + self.h_size, left:left + self.h_size]
            if mask is not None:
                mask = mask[top:top + self.h_size, left:left + self.h_size]
                img_gt, mask = augment([img_gt, mask], self.use_hflip, self.use_rot)
            else:
                img_gt = augment(img_gt, self.use_hflip, self.use_rot)
            out = degradation_bsrgan(img_gt, self.scale, self.lq_patchsize, mask=mask)
            if mask is not None:
                lq, hq, mask = out
                return {"lq": lq, "gt": hq, "gt_mask": mask, "gt_path": gt_path}
            lq, hq = out
            return {"lq": lq, "gt": hq, "gt_path": gt_path}
        # test phase: bicubic downsample pairing
        from ssl_tpu.utils.matlab_resize import imresize
        lq = np.clip(imresize(img_gt, 1.0 / self.scale), 0, 1).astype(np.float32)
        return {"lq": lq, "gt": img_gt, "gt_path": gt_path}
