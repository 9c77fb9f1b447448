"""BSRGAN shuffled degradation chain (KAIR tree path).

Reference parity: train_BSGRAN/utils/utils_blindsr.py:443-530
(degradation_bsrgan): optional x2 pre-downsample, a shuffled 7-op chain
(blur x2, downsample2, downsample3-kept-last, Gaussian noise, JPEG, ISP) and
a final JPEG, then random crop.  The mask-aware dataset (DatasetBlindSRMask,
train_BSGRAN/data/dataset_blindsrmask.py:62-67) crops GT+mask to H_size FIRST,
so the trailing random_crop is an identity exactly when
``H_size == lq_patchsize * sf`` — that invariant is asserted here instead of
silently relied upon."""

from __future__ import annotations

import random

import cv2
import numpy as np
from scipy import ndimage

from ssl_tpu.data.degradations import bivariate_gaussian
from ssl_tpu.utils.matlab_resize import imresize


def _fspecial_gaussian(size: int, sigma: float) -> np.ndarray:
    ax = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    k = np.outer(g, g)
    return k / k.sum()


def _shift_pixel(k: np.ndarray, sf: int) -> np.ndarray:
    """Shift kernel to compensate nearest-downsampling misalignment
    (0.5*(sf-1) pixel shift toward the upper-left)."""
    shift = 0.5 * (sf - 1)
    h, w = k.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    from scipy.interpolate import RegularGridInterpolator
    interp = RegularGridInterpolator((np.arange(h), np.arange(w)), k,
                                     bounds_error=False, fill_value=0.0)
    pts = np.stack([yy + shift, xx + shift], axis=-1).reshape(-1, 2)
    return interp(pts).reshape(h, w)


def add_blur(img: np.ndarray, sf: int = 4, rng=random) -> np.ndarray:
    """Anisotropic/isotropic Gaussian blur with sf-scaled sigma range."""
    wd2 = 4.0 + sf
    wd = 2.0 + 0.2 * sf
    if rng.random() < 0.5:
        l1 = np.random.uniform(0.1, wd2)
        l2 = np.random.uniform(0.1, l1)
        theta = np.random.uniform(0, np.pi)
        k = bivariate_gaussian(2 * rng.randint(2, 11) + 3, np.sqrt(l1), np.sqrt(l2),
                               theta, isotropic=False)
    else:
        k = _fspecial_gaussian(2 * rng.randint(2, 11) + 3, wd * np.random.rand())
    return ndimage.convolve(img, k[..., None], mode="mirror")


def add_gaussian_noise_bsr(img: np.ndarray, noise_level1=1, noise_level2=12) -> np.ndarray:
    """Three noise modes: per-channel iid / grayscale / 3x3-covariance color."""
    noise_level = random.randint(noise_level1, noise_level2)
    rnum = np.random.rand()
    if rnum > 0.6:
        img = img + np.random.normal(0, noise_level / 255.0, img.shape).astype(np.float32)
    elif rnum > 0.4:
        img = img + np.random.normal(0, noise_level / 255.0, img.shape[:2] + (1,)).astype(np.float32)
    else:
        L = noise_level2 / 255.0
        d = np.diag(np.random.rand(3))
        u = np.linalg.qr(np.random.randn(3, 3))[0]
        conv = u @ d @ u.T
        noise = np.random.multivariate_normal([0, 0, 0], np.abs(L ** 2 * conv),
                                              img.shape[:2]).astype(np.float32)
        img = img + noise
    return np.clip(img, 0.0, 1.0)


def add_jpeg_noise(img: np.ndarray, rng=random) -> np.ndarray:
    quality = rng.randint(30, 95)
    bgr = (np.clip(img, 0, 1) * 255.0).round().astype(np.uint8)[..., ::-1]
    _, enc = cv2.imencode(".jpg", bgr, [int(cv2.IMWRITE_JPEG_QUALITY), quality])
    return cv2.imdecode(enc, 1)[..., ::-1].astype(np.float32) / 255.0


def degradation_bsrgan(img: np.ndarray, sf: int = 4, lq_patchsize: int = 72,
                       mask: np.ndarray | None = None, no_crop: bool = False):
    """Degrade an HWC [0,1] GT into (lq, hq[, mask]); mask rides along with hq
    (the SSL mask path needs them aligned).  ``no_crop`` keeps the full image
    (offline test-set synthesis, generate_realesrgan_bsrgan_lr.py) — the lq is
    resized to exactly (h//sf, w//sf) instead of patch-cropped."""
    jpeg_prob, scale2_prob = 0.9, 0.25
    sf_ori = sf
    h1, w1 = img.shape[:2]
    img = img[: h1 - h1 % sf, : w1 - w1 % sf, ...]
    h, w = img.shape[:2]
    if h < lq_patchsize * sf or w < lq_patchsize * sf:
        raise ValueError(f"img size ({h1}X{w1}) is too small!")
    hq = img.copy()
    if mask is not None:
        mask = mask[: h1 - h1 % sf, : w1 - w1 % sf, ...]
        assert h == lq_patchsize * sf and w == lq_patchsize * sf, (
            "mask-aware BSRGAN degradation requires pre-cropped GT "
            "(H_size == lq_patchsize*sf) so the final crop is identity")

    if sf == 4 and random.random() < scale2_prob:
        if np.random.rand() < 0.5:
            img = cv2.resize(img, (w // 2, h // 2),
                             interpolation=random.choice([1, 2, 3]))
        else:
            img = imresize(img, 0.5)
        img = np.clip(img, 0.0, 1.0).astype(np.float32)
        sf = 2

    order = random.sample(range(7), 7)
    i2, i3 = order.index(2), order.index(3)
    if i2 > i3:  # keep downsample3 after downsample2
        order[i2], order[i3] = order[i3], order[i2]

    a, b = img.shape[1], img.shape[0]
    for i in order:
        if i in (0, 1):
            img = add_blur(img, sf=sf)
        elif i == 2:
            a, b = img.shape[1], img.shape[0]
            if random.random() < 0.75:
                sf1 = random.uniform(1, 1 / 0.85)
                img = cv2.resize(img, (int(img.shape[1] / sf1), int(img.shape[0] / sf1)),
                                 interpolation=random.choice([1, 2, 3]))
            else:
                k = _fspecial_gaussian(2 * random.randint(0, 3) + 3,
                                       random.uniform(0.1, 0.25 * sf))
                k = _shift_pixel(k, sf)
                k = k / k.sum()
                img = ndimage.convolve(img, k[..., None], mode="mirror")
                img = img[::sf, ::sf, ...]
            img = np.clip(img, 0.0, 1.0).astype(np.float32)
        elif i == 3:
            img = cv2.resize(img, (int(a / sf), int(b / sf)),
                             interpolation=random.choice([1, 2, 3]))
            img = np.clip(img, 0.0, 1.0).astype(np.float32)
        elif i == 4:
            img = add_gaussian_noise_bsr(img, 1, 12)
        elif i == 5:
            if random.random() < jpeg_prob:
                img = add_jpeg_noise(img)
        # i == 6: camera ISP model — reference gates on isp_model=None (unused)

    img = add_jpeg_noise(img)

    if no_crop:
        target = (w // sf_ori, h // sf_ori)
        if img.shape[:2] != (target[1], target[0]):
            img = cv2.resize(img, target, interpolation=cv2.INTER_CUBIC)
            img = np.clip(img, 0, 1).astype(np.float32)
        if mask is not None:
            return img.astype(np.float32), hq.astype(np.float32), mask
        return img.astype(np.float32), hq.astype(np.float32)

    # final crop (identity in the mask-aware path; random otherwise)
    lh, lw = img.shape[:2]
    if lh > lq_patchsize or lw > lq_patchsize:
        top = random.randint(0, lh - lq_patchsize)
        left = random.randint(0, lw - lq_patchsize)
        img = img[top:top + lq_patchsize, left:left + lq_patchsize]
        hq = hq[top * sf_ori:(top + lq_patchsize) * sf_ori,
                left * sf_ori:(left + lq_patchsize) * sf_ori]
        if mask is not None:
            mask = mask[top * sf_ori:(top + lq_patchsize) * sf_ori,
                        left * sf_ori:(left + lq_patchsize) * sf_ori]
    # guarantee exact lq size (interp rounding can drift a pixel)
    if img.shape[:2] != (lq_patchsize, lq_patchsize):
        img = cv2.resize(img, (lq_patchsize, lq_patchsize), interpolation=cv2.INTER_CUBIC)
        img = np.clip(img, 0, 1).astype(np.float32)
    if mask is not None:
        return img.astype(np.float32), hq.astype(np.float32), mask
    return img.astype(np.float32), hq.astype(np.float32)
