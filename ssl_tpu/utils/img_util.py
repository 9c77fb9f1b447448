"""Image IO + conversion utilities (reference surface: utils/img_util.py).

All in-framework images are NHWC float32 RGB in [0,1]; files are read with
cv2 (BGR uint8) and converted here."""

from __future__ import annotations

import os

import cv2
import numpy as np


def imfrombytes(content: bytes, flag: str = "color", float32: bool = False) -> np.ndarray:
    """Decode image bytes -> HWC BGR uint8 (cv2 convention), like the reference."""
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {"color": cv2.IMREAD_COLOR, "grayscale": cv2.IMREAD_GRAYSCALE,
                    "unchanged": cv2.IMREAD_UNCHANGED}
    img = cv2.imdecode(img_np, imread_flags[flag])
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def imread(path: str, float32: bool = True) -> np.ndarray:
    with open(path, "rb") as f:
        return imfrombytes(f.read(), float32=float32)


def img2array(img: np.ndarray, bgr2rgb: bool = True, float32: bool = True) -> np.ndarray:
    """HWC BGR (cv2) -> HWC RGB float32 [0,1] (framework layout; reference
    img2tensor produces CHW — we stay channel-last for TPU)."""
    if img.ndim == 2:
        img = img[..., None]
    if bgr2rgb and img.shape[2] == 3:
        img = img[..., ::-1]
    img = np.ascontiguousarray(img)
    if float32 and img.dtype != np.float32:
        img = img.astype(np.float32) / 255.0
    return img


def array2img(arr, rgb2bgr: bool = True, min_max=(0, 1)) -> np.ndarray:
    """NHWC/HWC float array -> HWC uint8 BGR for cv2.imwrite (reference tensor2img)."""
    arr = np.asarray(arr)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip(arr, *min_max)
    arr = (arr - min_max[0]) / (min_max[1] - min_max[0])
    img = (arr * 255.0).round().astype(np.uint8)
    if rgb2bgr and img.ndim == 3 and img.shape[2] == 3:
        img = img[..., ::-1]
    return np.ascontiguousarray(img)


def imwrite(img: np.ndarray, file_path: str, auto_mkdir: bool = True) -> bool:
    if auto_mkdir:
        os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    return cv2.imwrite(file_path, img)


def crop_border(imgs, crop_border_px: int):
    """Crop `crop_border_px` from each spatial edge (reference img_util.py:166)."""
    if crop_border_px == 0:
        return imgs
    if isinstance(imgs, list):
        return [v[crop_border_px:-crop_border_px, crop_border_px:-crop_border_px, ...] for v in imgs]
    return imgs[crop_border_px:-crop_border_px, crop_border_px:-crop_border_px, ...]
