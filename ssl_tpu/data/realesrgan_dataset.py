"""RealESRGAN-style datasets: GT (+mask) with per-item random blur kernels.

Reference parity: data/realesrgan_dataset.py (no mask) and
my_realesrgan_image_mask_dataset.py:17-159 (with mask; 2-stage kernels + final
sinc synthesized per item in __getitem__; pixel degradation happens later in
the batch pipeline — here host-side RealESRGANDegrader instead of the
reference's on-GPU feed_data)."""

from __future__ import annotations

import math
import os
import random

import numpy as np

from ssl_tpu.data.data_util import paths_from_folder
from ssl_tpu.data.degradations import circular_lowpass_kernel, random_mixed_kernels
from ssl_tpu.data.paired_image_dataset import BaseDataset, load_mask
from ssl_tpu.data.transforms import augment
from ssl_tpu.utils.img_util import img2array, imread
from ssl_tpu.utils.registry import DATASET_REGISTRY

_DEFAULTS = dict(
    blur_kernel_size=21,
    kernel_list=["iso", "aniso", "generalized_iso", "generalized_aniso",
                 "plateau_iso", "plateau_aniso"],
    kernel_prob=[0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
    sinc_prob=0.1, blur_sigma=[0.2, 3], betag_range=[0.5, 4], betap_range=[1, 2],
    blur_kernel_size2=21,
    kernel_list2=["iso", "aniso", "generalized_iso", "generalized_aniso",
                  "plateau_iso", "plateau_aniso"],
    kernel_prob2=[0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
    sinc_prob2=0.1, blur_sigma2=[0.2, 1.5], betag_range2=[0.5, 4], betap_range2=[1, 2],
    final_sinc_prob=0.8,
)


def _pulse(size: int = 21) -> np.ndarray:
    k = np.zeros((size, size), np.float32)
    k[size // 2, size // 2] = 1.0
    return k


class _KernelSynth:
    """Per-item 2-stage + sinc kernel synthesis (reference my_realesrgan_...
    dataset __getitem__:88-141)."""

    def __init__(self, opt: dict):
        self.o = {**_DEFAULTS, **{k: v for k, v in opt.items() if k in _DEFAULTS}}
        self.kernel_range = [2 * v + 1 for v in range(3, 11)]  # 7..21

    def sample(self, rng=None):
        o = self.o
        rng = rng or np.random
        # stage-1 kernel
        ks = random.choice(self.kernel_range)
        if np.random.uniform() < o["sinc_prob"]:
            omega_c = np.random.uniform(np.pi / 3 if ks < 13 else np.pi / 5, np.pi)
            kernel = circular_lowpass_kernel(omega_c, ks, pad_to=False)
        else:
            kernel = random_mixed_kernels(o["kernel_list"], o["kernel_prob"], ks,
                                          o["blur_sigma"], o["blur_sigma"],
                                          [-math.pi, math.pi], o["betag_range"],
                                          o["betap_range"], noise_range=None)
        pad = (21 - ks) // 2
        kernel = np.pad(kernel, ((pad, pad), (pad, pad)))
        # stage-2 kernel
        ks2 = random.choice(self.kernel_range)
        if np.random.uniform() < o["sinc_prob2"]:
            omega_c = np.random.uniform(np.pi / 3 if ks2 < 13 else np.pi / 5, np.pi)
            kernel2 = circular_lowpass_kernel(omega_c, ks2, pad_to=False)
        else:
            kernel2 = random_mixed_kernels(o["kernel_list2"], o["kernel_prob2"], ks2,
                                           o["blur_sigma2"], o["blur_sigma2"],
                                           [-math.pi, math.pi], o["betag_range2"],
                                           o["betap_range2"], noise_range=None)
        pad = (21 - ks2) // 2
        kernel2 = np.pad(kernel2, ((pad, pad), (pad, pad)))
        # final sinc
        if np.random.uniform() < o["final_sinc_prob"]:
            ks3 = random.choice(self.kernel_range)
            omega_c = np.random.uniform(np.pi / 3, np.pi)
            sinc = circular_lowpass_kernel(omega_c, ks3, pad_to=21)
        else:
            sinc = _pulse(21)
        return (kernel.astype(np.float32), kernel2.astype(np.float32), sinc.astype(np.float32))


@DATASET_REGISTRY.register()
class RealESRGANDataset(BaseDataset):
    """GT-only + kernels (reference realesrgan_dataset.py)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.paths = paths_from_folder(opt["dataroot_gt"])
        self.synth = _KernelSynth(opt)
        self.use_hflip = opt.get("use_hflip", True)
        self.use_rot = opt.get("use_rot", True)
        self.crop_size = opt.get("gt_size", None)  # pre-crop target; full degrade then crop later

    def _load_gt(self, index):
        img_gt = img2array(imread(self.paths[index]))
        return augment(img_gt, self.use_hflip, self.use_rot)

    def __getitem__(self, index):
        img_gt = self._load_gt(index)
        k1, k2, sinc = self.synth.sample()
        return {"gt": img_gt, "kernel1": k1, "kernel2": k2, "sinc_kernel": sinc,
                "gt_path": self.paths[index]}


@DATASET_REGISTRY.register()
class MyRealESRGANImageMaskDataset(RealESRGANDataset):
    """GT + edge mask + kernels (reference my_realesrgan_image_mask_dataset.py).

    The 400-crop: reference loads full sub-image (usually 512 or 400) and the
    matching .mat mask; both are center/random-cropped together to crop_pre
    before kernels are attached."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.mask_root = opt["dataroot_gt_mask"]
        self.crop_pre = opt.get("crop_pre")  # e.g. 400 in reference configs

    def __getitem__(self, index):
        gt_path = self.paths[index]
        img_gt = img2array(imread(gt_path))
        base = os.path.splitext(os.path.basename(gt_path))[0]
        mask = None
        for ext in (".mat", ".npy", ".png"):
            cand = os.path.join(self.mask_root, base + ext)
            if os.path.exists(cand):
                mask = load_mask(cand)[..., None]
                break
        if mask is None:
            raise FileNotFoundError(f"no mask for {base} in {self.mask_root}")
        if self.crop_pre:
            h, w = img_gt.shape[:2]
            top = random.randint(0, max(h - self.crop_pre, 0))
            left = random.randint(0, max(w - self.crop_pre, 0))
            img_gt = img_gt[top:top + self.crop_pre, left:left + self.crop_pre]
            mask = mask[top:top + self.crop_pre, left:left + self.crop_pre]
        img_gt, mask = augment([img_gt, mask], self.use_hflip, self.use_rot)
        k1, k2, sinc = self.synth.sample()
        return {"gt": img_gt, "gt_mask": mask, "kernel1": k1, "kernel2": k2,
                "sinc_kernel": sinc, "gt_path": gt_path}
