"""CPU-side augmentation transforms (reference: data/transforms.py).

Numpy HWC images. Includes the mask-aware paired random crop that keeps the
edge mask aligned with GT (reference paired_random_crop_img_mask :93-151)."""

from __future__ import annotations

import random

import numpy as np


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale, ...]


def paired_random_crop(img_gts, img_lqs, gt_patch_size, scale, rng=None):
    """Random aligned crop: LQ gets gt_patch_size//scale (reference :10-90)."""
    rng = rng or random
    single_gt = not isinstance(img_gts, list)
    single_lq = not isinstance(img_lqs, list)
    if single_gt:
        img_gts = [img_gts]
    if single_lq:
        img_lqs = [img_lqs]
    h_lq, w_lq = img_lqs[0].shape[:2]
    h_gt, w_gt = img_gts[0].shape[:2]
    lq_patch_size = gt_patch_size // scale
    if h_gt != h_lq * scale or w_gt != w_lq * scale:
        raise ValueError(f"Scale mismatches. GT ({h_gt}, {w_gt}) is not {scale}x of LQ ({h_lq}, {w_lq}).")
    if h_lq < lq_patch_size or w_lq < lq_patch_size:
        raise ValueError(f"LQ ({h_lq}, {w_lq}) is smaller than patch size ({lq_patch_size}, {lq_patch_size}).")
    top = rng.randint(0, h_lq - lq_patch_size)
    left = rng.randint(0, w_lq - lq_patch_size)
    img_lqs = [v[top:top + lq_patch_size, left:left + lq_patch_size, ...] for v in img_lqs]
    top_gt, left_gt = top * scale, left * scale
    img_gts = [v[top_gt:top_gt + gt_patch_size, left_gt:left_gt + gt_patch_size, ...] for v in img_gts]
    return (img_gts[0] if single_gt else img_gts), (img_lqs[0] if single_lq else img_lqs)


def paired_random_crop_img_mask(img_gts, img_lqs, img_masks, gt_patch_size, scale, rng=None):
    """Aligned crop of GT + LQ + full-resolution edge mask (reference :93-151)."""
    rng = rng or random
    single_gt = not isinstance(img_gts, list)
    single_lq = not isinstance(img_lqs, list)
    single_mask = not isinstance(img_masks, list)
    if single_gt:
        img_gts = [img_gts]
    if single_lq:
        img_lqs = [img_lqs]
    if single_mask:
        img_masks = [img_masks]
    h_lq, w_lq = img_lqs[0].shape[:2]
    h_gt, w_gt = img_gts[0].shape[:2]
    lq_patch_size = gt_patch_size // scale
    if h_gt != h_lq * scale or w_gt != w_lq * scale:
        raise ValueError(f"Scale mismatches. GT ({h_gt}, {w_gt}) is not {scale}x of LQ ({h_lq}, {w_lq}).")
    top = rng.randint(0, h_lq - lq_patch_size)
    left = rng.randint(0, w_lq - lq_patch_size)
    img_lqs = [v[top:top + lq_patch_size, left:left + lq_patch_size, ...] for v in img_lqs]
    top_gt, left_gt = top * scale, left * scale
    img_gts = [v[top_gt:top_gt + gt_patch_size, left_gt:left_gt + gt_patch_size, ...] for v in img_gts]
    img_masks = [v[top_gt:top_gt + gt_patch_size, left_gt:left_gt + gt_patch_size, ...] for v in img_masks]
    return ((img_gts[0] if single_gt else img_gts),
            (img_lqs[0] if single_lq else img_lqs),
            (img_masks[0] if single_mask else img_masks))


def augment(imgs, hflip=True, rotation=True, flows=None, return_status=False, rng=None):
    """Horizontal flip + 90-degree rotation augmentation (reference :154-240).

    vflip+transpose composition == rot90, matching the reference's scheme."""
    rng = rng or random
    hflip = hflip and rng.random() < 0.5
    vflip = rotation and rng.random() < 0.5
    rot90 = rotation and rng.random() < 0.5

    def _augment(img):
        if hflip:
            img = img[:, ::-1, ...]
        if vflip:
            img = img[::-1, :, ...]
        if rot90:
            img = img.transpose(1, 0, 2) if img.ndim == 3 else img.T
        return np.ascontiguousarray(img)

    single = not isinstance(imgs, list)
    if single:
        imgs = [imgs]
    imgs = [_augment(v) for v in imgs]
    if single:
        imgs = imgs[0]
    if return_status:
        return imgs, (hflip, vflip, rot90)
    return imgs
