"""BSRGAN shuffled degradation chain (KAIR tree path).

Reference parity: train_BSGRAN/utils/utils_blindsr.py:443-530
(degradation_bsrgan): optional x2 pre-downsample, a shuffled 7-op chain
(blur x2, downsample2, downsample3-kept-last, Gaussian noise, JPEG, ISP) and
a final JPEG, then random crop.  The mask-aware dataset (DatasetBlindSRMask,
train_BSGRAN/data/dataset_blindsrmask.py:62-67) crops GT+mask to H_size FIRST,
so the trailing random_crop is an identity exactly when
``H_size == lq_patchsize * sf`` — that invariant is asserted here instead of
silently relied upon.

Every op consumes the global ``random`` / ``np.random`` streams in EXACTLY
the reference's draw order, so seeding both sides identically produces
bit-equal outputs — that is how tests/test_bsrgan_parity.py verifies this
module against the reference's own executed utils_blindsr.py."""

from __future__ import annotations

import random

import cv2
import numpy as np
from scipy import ndimage

from ssl_tpu.utils.matlab_resize import imresize


def _fspecial_gaussian(hsize: int, sigma: float) -> np.ndarray:
    """matlab fspecial('gaussian') (utils_blindsr.py:188-200), incl. the
    eps-threshold zeroing."""
    siz = (hsize - 1.0) / 2.0
    x, y = np.meshgrid(np.arange(-siz, siz + 1), np.arange(-siz, siz + 1))
    h = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    h[h < np.finfo(float).eps * h.max()] = 0
    sumh = h.sum()
    if sumh != 0:
        h = h / sumh
    return h


def anisotropic_gaussian_bsr(ksize: int, theta: float, l1: float, l2: float) -> np.ndarray:
    """utils_blindsr.anisotropic_Gaussian (:64-96): eigenvalue-parameterized
    Gaussian evaluated on the gm_blur_kernel grid (center = size/2 - 1)."""
    v = np.array([np.cos(theta), np.sin(theta)])
    V = np.array([[v[0], v[1]], [v[1], -v[0]]])
    D = np.array([[l1, 0.0], [0.0, l2]])
    sigma = V @ D @ np.linalg.inv(V)
    inv = np.linalg.inv(sigma)
    center = ksize / 2.0 + 0.5
    ys, xs = np.mgrid[0:ksize, 0:ksize].astype(np.float64)
    cy = ys - center + 1
    cx = xs - center + 1
    quad = inv[0, 0] * cx * cx + (inv[0, 1] + inv[1, 0]) * cx * cy + inv[1, 1] * cy * cy
    k = np.exp(-0.5 * quad)
    return k / k.sum()


def shift_pixel(x: np.ndarray, sf: int, upper_left: bool = True) -> np.ndarray:
    """utils_blindsr.shift_pixel (:99-126): bilinear resample at +0.5*(sf-1),
    coordinates clipped to the image (scipy interp2d linear semantics)."""
    from scipy.interpolate import RegularGridInterpolator
    h, w = x.shape[:2]
    shift = (sf - 1) * 0.5
    xv, yv = np.arange(0, w, 1.0), np.arange(0, h, 1.0)
    x1 = xv + shift if upper_left else xv - shift
    y1 = yv + shift if upper_left else yv - shift
    x1 = np.clip(x1, 0, w - 1)
    y1 = np.clip(y1, 0, h - 1)
    interp = RegularGridInterpolator((yv, xv), x, method="linear")
    yy, xx = np.meshgrid(y1, x1, indexing="ij")
    return interp(np.stack([yy, xx], axis=-1))


def add_blur(img: np.ndarray, sf: int = 4) -> np.ndarray:
    """utils_blindsr.add_blur (:335-346): 30% anisotropic (eigenvalues in
    [0, 0.2+0.2*sf]), else isotropic fspecial; ksize in {3,5,7,9};
    mirror-padded convolution."""
    wd2 = 0.2 + 0.2 * sf
    wd = 0.2 + 0.2 * sf
    if random.random() < 0.3:
        l1 = wd2 * random.random()
        l2 = wd2 * random.random()
        k = anisotropic_gaussian_bsr(2 * random.randint(0, 3) + 3,
                                     random.random() * np.pi, l1, l2)
    else:
        k = _fspecial_gaussian(2 * random.randint(0, 3) + 3, wd * random.random())
    return ndimage.convolve(img, np.expand_dims(k, axis=2), mode="mirror")


def add_resize(img: np.ndarray, sf: int = 4) -> np.ndarray:
    """utils_blindsr.add_resize (:349-360)."""
    rnum = np.random.rand()
    if rnum > 0.8:
        sf1 = random.uniform(1, 2)
    elif rnum < 0.7:
        sf1 = random.uniform(0.5 / sf, 1)
    else:
        sf1 = 1.0
    img = cv2.resize(img, (int(sf1 * img.shape[1]), int(sf1 * img.shape[0])),
                     interpolation=random.choice([1, 2, 3]))
    return np.clip(img, 0.0, 1.0)


def add_gaussian_noise_bsr(img: np.ndarray, noise_level1=1, noise_level2=12) -> np.ndarray:
    """utils_blindsr.add_Gaussian_noise (:363-377): color (rnum>0.6) /
    grayscale (rnum<0.4) / correlated 3x3-covariance (else)."""
    noise_level = random.randint(noise_level1, noise_level2)
    rnum = np.random.rand()
    if rnum > 0.6:
        img = img + np.random.normal(0, noise_level / 255.0, img.shape).astype(np.float32)
    elif rnum < 0.4:
        img = img + np.random.normal(0, noise_level / 255.0,
                                     (*img.shape[:2], 1)).astype(np.float32)
    else:
        from scipy.linalg import orth
        L = noise_level2 / 255.0
        D = np.diag(np.random.rand(3))
        U = orth(np.random.rand(3, 3))
        conv = np.dot(np.dot(np.transpose(U), D), U)
        img = img + np.random.multivariate_normal(
            [0, 0, 0], np.abs(L ** 2 * conv), img.shape[:2]).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


def add_speckle_noise(img: np.ndarray, noise_level1=2, noise_level2=25) -> np.ndarray:
    """utils_blindsr.add_speckle_noise (:380-395) — multiplicative variant."""
    noise_level = random.randint(noise_level1, noise_level2)
    img = np.clip(img, 0.0, 1.0)
    rnum = random.random()
    if rnum > 0.6:
        img = img + img * np.random.normal(0, noise_level / 255.0, img.shape).astype(np.float32)
    elif rnum < 0.4:
        img = img + img * np.random.normal(0, noise_level / 255.0,
                                           (*img.shape[:2], 1)).astype(np.float32)
    else:
        from scipy.linalg import orth
        L = noise_level2 / 255.0
        D = np.diag(np.random.rand(3))
        U = orth(np.random.rand(3, 3))
        conv = np.dot(np.dot(np.transpose(U), D), U)
        img = img + img * np.random.multivariate_normal(
            [0, 0, 0], np.abs(L ** 2 * conv), img.shape[:2]).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


def add_poisson_noise_bsr(img: np.ndarray) -> np.ndarray:
    """utils_blindsr.add_Poisson_noise (:398-409): uint8-rounded base,
    vals = 10^uniform[2,4], 50% full-color / 50% gray-only noise."""
    img = np.clip((img * 255.0).round(), 0, 255) / 255.0
    vals = 10 ** (2 * random.random() + 2.0)
    if random.random() < 0.5:
        img = np.random.poisson(img * vals).astype(np.float32) / vals
    else:
        img_gray = np.dot(img[..., :3], [0.299, 0.587, 0.114])
        img_gray = np.clip((img_gray * 255.0).round(), 0, 255) / 255.0
        noise_gray = np.random.poisson(img_gray * vals).astype(np.float32) / vals - img_gray
        img = img + noise_gray[:, :, np.newaxis]
    return np.clip(img, 0.0, 1.0)


def add_jpeg_noise(img: np.ndarray) -> np.ndarray:
    """utils_blindsr.add_JPEG_noise (:412-418): cv2 codec, quality in
    [75, 95] (randint)."""
    quality = random.randint(75, 95)
    bgr = cv2.cvtColor(np.uint8((np.clip(img, 0, 1) * 255.0).round()), cv2.COLOR_RGB2BGR)
    _, enc = cv2.imencode(".jpg", bgr, [int(cv2.IMWRITE_JPEG_QUALITY), quality])
    dec = cv2.imdecode(enc, 1)
    return cv2.cvtColor(dec, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def degradation_bsrgan(img: np.ndarray, sf: int = 4, lq_patchsize: int = 72,
                       mask: np.ndarray | None = None, no_crop: bool = False):
    """Degrade an HWC [0,1] GT into (lq, hq[, mask]); mask rides along with hq
    (the SSL mask path needs them aligned).  ``no_crop`` keeps the full image
    (offline test-set synthesis, generate_realesrgan_bsrgan_lr.py) — the lq is
    resized to exactly (h//sf, w//sf) instead of patch-cropped.

    Op structure, probabilities, and the random-draw ORDER exactly mirror the
    reference degradation_bsrgan (:443-530)."""
    isp_prob, jpeg_prob, scale2_prob = 0.25, 0.9, 0.25
    sf_ori = sf
    h1, w1 = img.shape[:2]
    img = img.copy()[: h1 - h1 % sf, : w1 - w1 % sf, ...]
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
            img = cv2.resize(img, (int(1 / 2 * img.shape[1]), int(1 / 2 * img.shape[0])),
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
                img = cv2.resize(img, (int(1 / sf1 * img.shape[1]), int(1 / sf1 * img.shape[0])),
                                 interpolation=random.choice([1, 2, 3]))
            else:
                k = _fspecial_gaussian(2 * random.randint(0, 3) + 3,
                                       random.uniform(0.1, 0.25 * sf))
                k_shifted = shift_pixel(k, sf)
                k_shifted = k_shifted / k_shifted.sum()
                img = ndimage.convolve(img, np.expand_dims(k_shifted, axis=2), mode="mirror")
                img = img[0::sf, 0::sf, ...]
            img = np.clip(img, 0.0, 1.0).astype(np.float32)
        elif i == 3:
            img = cv2.resize(img, (int(1 / sf * a), int(1 / sf * b)),
                             interpolation=random.choice([1, 2, 3]))
            img = np.clip(img, 0.0, 1.0).astype(np.float32)
        elif i == 4:
            img = add_gaussian_noise_bsr(img, 1, 12)
        elif i == 5:
            if random.random() < jpeg_prob:
                img = add_jpeg_noise(img)
        elif i == 6:
            # camera ISP model: the reference consumes the probability draw
            # even with isp_model=None (short-circuit AND, :521)
            random.random()

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
