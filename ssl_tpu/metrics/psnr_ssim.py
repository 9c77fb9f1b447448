"""PSNR / SSIM, matlab-faithful (reference: metrics/psnr_ssim.py).

Numpy implementations on HWC [0,255] images (the reference's convention), with
crop_border and test_y_channel options; SSIM uses the 11x11 sigma-1.5 Gaussian
and 'valid' convolution like the matlab original."""

from __future__ import annotations

import cv2
import numpy as np

from ssl_tpu.utils.color_util import to_y_channel
from ssl_tpu.utils.registry import METRIC_REGISTRY


def _prep(img, img2, crop_border, test_y_channel, input_order="HWC"):
    assert img.shape == img2.shape, f"Image shapes are different: {img.shape}, {img2.shape}."
    img = np.asarray(img, np.float64)
    img2 = np.asarray(img2, np.float64)
    if input_order == "CHW":
        img, img2 = img.transpose(1, 2, 0), img2.transpose(1, 2, 0)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)
    return img.astype(np.float64), img2.astype(np.float64)


@METRIC_REGISTRY.register()
def calculate_psnr(img, img2, crop_border=0, input_order="HWC", test_y_channel=False, **kwargs):
    img, img2 = _prep(img, img2, crop_border, test_y_channel, input_order)
    mse = np.mean((img - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def _ssim_single(img, img2):
    """SSIM for one channel, [0,255] float64, valid-window convolution."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / \
               ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return ssim_map.mean()


@METRIC_REGISTRY.register()
def calculate_ssim(img, img2, crop_border=0, input_order="HWC", test_y_channel=False, **kwargs):
    img, img2 = _prep(img, img2, crop_border, test_y_channel, input_order)
    ssims = [_ssim_single(img[..., i], img2[..., i]) for i in range(img.shape[2])]
    return float(np.mean(ssims))
