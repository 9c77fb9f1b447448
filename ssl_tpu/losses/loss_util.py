"""Loss helpers: weighted reduction + LDL artifact maps (jnp).

Reference parity: basicsr/losses/loss_util.py:13-161."""

from __future__ import annotations

import jax.numpy as jnp

from ssl_tpu.ops.ssg import reflect_pad_2d


def reduce_loss(loss: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "none":
        return loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(f"invalid reduction: {reduction}")


def weight_reduce_loss(loss, weight=None, reduction="mean"):
    """Element-wise weighting then reduce; 'mean' divides by the weight mass
    (reference loss_util.py:33-62 semantics)."""
    if weight is not None:
        loss = loss * weight
    if weight is None or reduction == "sum":
        return reduce_loss(loss, reduction)
    if reduction == "mean":
        # NHWC layout: channel axis is -1
        if weight.shape[-1] > 1:
            wsum = jnp.sum(weight)
        else:
            wsum = jnp.sum(weight) * loss.shape[-1]
        return jnp.sum(loss) / (wsum + 1e-12)
    return loss


def _local_variance(residual: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Unbiased variance over a ksize x ksize reflect-padded local window.
    residual: (b,h,w,1) NHWC. Reference: get_local_weights, loss_util.py:106-127."""
    pad = (ksize - 1) // 2
    rp = jnp.pad(residual, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    b, h, w, c = residual.shape
    # unfold via stacked shifts: (b,h,w,1,k*k)
    cols = jnp.stack([
        rp[:, i:i + h, j:j + w, :] for i in range(ksize) for j in range(ksize)
    ], axis=-1)
    n = ksize * ksize
    mean = jnp.mean(cols, axis=-1, keepdims=True)
    return jnp.sum((cols - mean) ** 2, axis=-1) / (n - 1)


def get_refined_artifact_map(img_gt, img_output, img_ema, ksize=7):
    """LDL artifact map (reference loss_util.py:135-161). Inputs NHWC (b,h,w,c)."""
    residual_ema = jnp.sum(jnp.abs(img_gt - img_ema), axis=-1, keepdims=True)
    residual_sr = jnp.sum(jnp.abs(img_gt - img_output), axis=-1, keepdims=True)
    patch_level = jnp.var(residual_sr, axis=(1, 2, 3), keepdims=True, ddof=1) ** 0.2
    pixel_level = _local_variance(residual_sr, ksize)
    overall = patch_level * pixel_level
    return jnp.where(residual_sr < residual_ema, 0.0, overall)
