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


def _rgb2ycbcr_pt(img, y_only=False):
    """BT.601 RGB->YCbCr on (n, 3, h, w) [0,1] tensors (reference
    color_util.py:186-208, the batched torch flavor)."""
    import jax.numpy as jnp
    x = img.transpose(0, 2, 3, 1)
    if y_only:
        w = jnp.asarray([[65.481], [128.553], [24.966]], img.dtype)
        out = (x @ w).transpose(0, 3, 1, 2) + 16.0
    else:
        w = jnp.asarray([[65.481, -37.797, 112.0],
                         [128.553, -74.203, -93.786],
                         [24.966, 112.0, -18.214]], img.dtype)
        b = jnp.asarray([16.0, 128.0, 128.0], img.dtype).reshape(1, 3, 1, 1)
        out = (x @ w).transpose(0, 3, 1, 2) + b
    return out / 255.0


def _prep_pt(img, img2, crop_border, test_y_channel):
    import jax.numpy as jnp
    assert img.shape == img2.shape, f"Image shapes are different: {img.shape}, {img2.shape}."
    img = jnp.asarray(img, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    if crop_border != 0:
        img = img[:, :, crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[:, :, crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel:
        img = _rgb2ycbcr_pt(img, y_only=True)
        img2 = _rgb2ycbcr_pt(img2, y_only=True)
    return img, img2


@METRIC_REGISTRY.register()
def calculate_psnr_pt(img, img2, crop_border, test_y_channel=False, **kwargs):
    """Batched on-device PSNR (reference psnr_ssim.py:52-81, torch flavor):
    (n, 3/1, h, w) images in [0, 1], returns a per-image vector.  jnp fp32
    (jittable; the reference computes in fp64 — agreement is within ~1e-4 dB,
    pinned by tests/test_metrics_pt.py)."""
    import jax.numpy as jnp
    img, img2 = _prep_pt(img, img2, crop_border, test_y_channel)
    mse = jnp.mean((img - img2) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(1.0 / (mse + 1e-8))


def _ssim_pt(img, img2):
    """(n, c, h, w) [0,255]: grouped valid-window Gaussian SSIM
    (reference psnr_ssim.py:201-231)."""
    import jax.numpy as jnp
    from jax import lax
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    k = cv2.getGaussianKernel(11, 1.5)
    window = jnp.asarray(np.outer(k, k.transpose()), img.dtype)
    c = img.shape[1]
    w = jnp.tile(window[None, None], (c, 1, 1, 1))  # (c, 1, 11, 11) grouped

    def conv(x):
        return lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c)

    mu1, mu2 = conv(img), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = conv(img * img) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img * img2) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map.mean(axis=(1, 2, 3))


@METRIC_REGISTRY.register()
def calculate_ssim_pt(img, img2, crop_border, test_y_channel=False, **kwargs):
    """Batched on-device SSIM (reference psnr_ssim.py:132-166, torch flavor):
    (n, 3/1, h, w) in [0, 1], per-image vector out.  fp32 jnp (jittable);
    fp64-oracle agreement pinned by tests/test_metrics_pt.py."""
    img, img2 = _prep_pt(img, img2, crop_border, test_y_channel)
    return _ssim_pt(img * 255.0, img2 * 255.0)
