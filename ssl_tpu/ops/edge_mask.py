"""Edge-mask generation: Laplacian(grayscale) > threshold.

Two paths with identical semantics:
- ``edge_mask_np``: offline/script path, byte-exact with the reference workflow
  (PIL 'L' grayscale + cv2.Laplacian CV_8U, generate_mask.py:17-41).
- ``edge_mask_jax``: on-device jit path so masks can be produced inside the
  input pipeline without the offline .mat step (an addition the reference
  lacks; useful for the diffusion tree and quick experiments)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def rgb_to_gray_l(img: np.ndarray) -> np.ndarray:
    """PIL 'L' conversion, bit-exact with Pillow's L24 fixed point:
    ``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16`` (rounds, unlike the
    naive /1000 truncation).  img: HWC RGB uint8 (or [0,1] float -> scaled)."""
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255.0).round().astype(np.uint8)
    img = img.astype(np.int64)
    gray = (img[..., 0] * 19595 + img[..., 1] * 38470 + img[..., 2] * 7471
            + 0x8000) >> 16
    return gray.astype(np.uint8)


_LAPLACIAN_K = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)


def edge_mask_np(img: np.ndarray, threshold: float = 20.0, use_log: bool = False,
                 log_sigma: float = 1.0, color_mode: str = "L",
                 log_ksize: int = 0) -> np.ndarray:
    """Binary edge mask from an RGB image (reference generate_mask.py).

    cv2.Laplacian with CV_8U *saturates negatives to 0* — only positive
    responses survive, which the threshold then binarizes.

    color_mode 'RGB' keeps the 3 channels (a 3-channel mask), matching the
    diffusion tree's generate_mask_simmatrix.py ``--mode RGB``; 'L' is the
    PIL-grayscale path both trees default to.  ``log_ksize > 0`` selects the
    simmatrix LoG pre-blur parameterization (``GaussianBlur(ksize=(k,k),
    sigmaX=0)``, sigma derived from ksize); otherwise ``log_sigma`` is used
    directly (GAN-tree flavor)."""
    import cv2
    if color_mode == "RGB":
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255.0).round().astype(np.uint8)
        src = img
    else:
        src = rgb_to_gray_l(img)
    if use_log:
        if log_ksize > 0:
            src = cv2.GaussianBlur(src, (log_ksize, log_ksize), 0)
        else:
            src = cv2.GaussianBlur(src, (0, 0), log_sigma)
    grad = cv2.Laplacian(src, cv2.CV_8U)  # saturating uint8 output
    return (grad > threshold).astype(np.float32)


def edge_mask_jax(img: jnp.ndarray, threshold: float = 20.0) -> jnp.ndarray:
    """jnp equivalent of edge_mask_np for NHWC [0,1] batches -> (b,h,w,1).

    Reproduces the CV_8U saturation semantics: the Laplacian response is
    clipped to [0,255] and rounded before thresholding."""
    u8 = jnp.round(jnp.clip(img, 0, 1) * 255.0)
    # Pillow L24 fixed point; the integer sum < 2^24 is exact in float32
    gray = jnp.floor((u8[..., 0] * 19595 + u8[..., 1] * 38470
                      + u8[..., 2] * 7471 + 32768.0) / 65536.0)
    g = jnp.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="edge")  # cv2 BORDER_REFLECT_101-ish interior
    lap = (g[:, :-2, 1:-1] + g[:, 2:, 1:-1] + g[:, 1:-1, :-2] + g[:, 1:-1, 2:]
           - 4.0 * g[:, 1:-1, 1:-1])
    grad = jnp.clip(jnp.round(lap), 0, 255)
    return (grad > threshold).astype(jnp.float32)[..., None]
