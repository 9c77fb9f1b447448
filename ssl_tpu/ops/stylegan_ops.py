"""TPU-native equivalents of the StyleGAN2 CUDA ops (SURVEY §2.1 N3/N4).

Reference: basicsr/ops/fused_act/ (fused bias + LeakyReLU fwd/bwd) and
basicsr/ops/upfirdn2d/ (upsample-FIR-downsample).  On TPU these are plain
jnp expressions XLA fuses — no custom kernels or hand-written backward needed
(autodiff covers them); provided for capability parity with the StyleGAN2
archs in the reference tree."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def fused_leaky_relu(x: jnp.ndarray, bias: jnp.ndarray | None = None,
                     negative_slope: float = 0.2, scale: float = 2 ** 0.5) -> jnp.ndarray:
    """bias-add + LeakyReLU + sqrt(2) rescale (reference fused_act semantics).
    NHWC: bias broadcasts over the channel axis."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale


def make_resample_kernel(k) -> np.ndarray:
    """1D/2D FIR kernel -> normalized 2D kernel (reference upfirdn2d helper)."""
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return k / k.sum()


def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1, down: int = 1,
              pad=(0, 0)) -> jnp.ndarray:
    """Upsample (zero-stuff) -> FIR filter -> downsample, NHWC.

    Matches the reference CUDA op's semantics (upfirdn2d.cu): zero insertion
    upsampling, zero padding (pad0, pad1) per spatial dim, valid conv with the
    flipped kernel, stride-`down` decimation."""
    if isinstance(pad, int):
        pad = (pad, pad)
    pad0, pad1 = pad
    b, h, w, c = x.shape
    kh, kw = kernel.shape

    if up > 1:
        # zero-stuff
        x = x.reshape(b, h, 1, w, 1, c)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1), (0, 0)))
        x = x.reshape(b, h * up, w * up, c)
    x = jnp.pad(x, ((0, 0), (max(pad0, 0), max(pad1, 0)),
                    (max(pad0, 0), max(pad1, 0)), (0, 0)))
    if pad0 < 0 or pad1 < 0:
        x = x[:, max(-pad0, 0): x.shape[1] - max(-pad1, 0),
              max(-pad0, 0): x.shape[2] - max(-pad1, 0), :]

    # depthwise valid conv with flipped kernel
    k = jnp.flip(jnp.asarray(kernel), (0, 1)).reshape(kh, kw, 1, 1)
    k = jnp.tile(k, (1, 1, 1, c))
    out = lax.conv_general_dilated(
        x, k, window_strides=(down, down), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return out


def upsample2x(x, kernel=(1, 3, 3, 1)):
    k = make_resample_kernel(kernel) * 4
    p = k.shape[0] - 2
    return upfirdn2d(x, jnp.asarray(k), up=2, down=1, pad=((p + 1) // 2 + 1, p // 2))


def downsample2x(x, kernel=(1, 3, 3, 1)):
    k = make_resample_kernel(kernel)
    p = k.shape[0] - 2
    return upfirdn2d(x, jnp.asarray(k), up=1, down=2, pad=((p + 1) // 2, p // 2))
