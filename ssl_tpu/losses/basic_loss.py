"""Pixel-space and distribution losses (reference: basicsr/losses/basic_loss.py).

Losses are plain callables (functional, jit-friendly); build via LOSS_REGISTRY
from option dicts, same schema as the reference YAMLs."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssl_tpu.losses.loss_util import weight_reduce_loss
from ssl_tpu.utils.registry import LOSS_REGISTRY

_VALID_REDUCTIONS = ("none", "mean", "sum")


def _check_reduction(reduction):
    if reduction not in _VALID_REDUCTIONS:
        raise ValueError(f"Unsupported reduction mode: {reduction}. Supported ones are: {_VALID_REDUCTIONS}")


@LOSS_REGISTRY.register()
class L1Loss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        _check_reduction(reduction)
        self.loss_weight, self.reduction = loss_weight, reduction

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * weight_reduce_loss(jnp.abs(pred - target), weight, self.reduction)


@LOSS_REGISTRY.register()
class MSELoss:
    def __init__(self, loss_weight=1.0, reduction="mean"):
        _check_reduction(reduction)
        self.loss_weight, self.reduction = loss_weight, reduction

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * weight_reduce_loss((pred - target) ** 2, weight, self.reduction)


@LOSS_REGISTRY.register()
class CharbonnierLoss:
    def __init__(self, loss_weight=1.0, reduction="mean", eps=1e-12):
        _check_reduction(reduction)
        self.loss_weight, self.reduction, self.eps = loss_weight, reduction, eps

    def __call__(self, pred, target, weight=None):
        loss = jnp.sqrt((pred - target) ** 2 + self.eps)
        return self.loss_weight * weight_reduce_loss(loss, weight, self.reduction)


@LOSS_REGISTRY.register()
class WeightedTVLoss:
    """TV loss via L1 of neighbor differences (reference basic_loss.py:132-158)."""

    def __init__(self, loss_weight=1.0, reduction="mean"):
        if reduction not in ("mean", "sum"):
            raise ValueError(f"Unsupported reduction mode: {reduction}. Supported ones are: mean | sum")
        self.loss_weight, self.reduction = loss_weight, reduction
        self._l1 = L1Loss(loss_weight=1.0, reduction=reduction)

    def __call__(self, pred, weight=None):
        # NHWC: height axis 1, width axis 2
        wy = None if weight is None else weight[:, :-1, :, :]
        wx = None if weight is None else weight[:, :, :-1, :]
        y_diff = self._l1(pred[:, :-1, :, :], pred[:, 1:, :, :], weight=wy)
        x_diff = self._l1(pred[:, :, :-1, :], pred[:, :, 1:, :], weight=wx)
        return self.loss_weight * (x_diff + y_diff)


@LOSS_REGISTRY.register()
class KLDistanceLoss:
    """KL divergence between SSG rows (reference basic_loss.py:269-282):
    kl_div(clamp(x,1e-10).log(), clamp(y,1e-10)) with optional row softmax."""

    def __init__(self, loss_weight=0.1, reduction="mean", softmax=False):
        self.loss_weight, self.reduction, self.softmax = loss_weight, reduction, softmax

    def pointwise(self, x, y):
        if self.softmax:
            x = jax.nn.softmax(x, axis=-1)
            y = jax.nn.softmax(y, axis=-1)
        x = jnp.clip(x, min=1e-10)
        y = jnp.clip(y, min=1e-10)
        return y * (jnp.log(y) - jnp.log(x))

    def __call__(self, x, y):
        kld = self.pointwise(x, y)
        if self.reduction == "mean":
            kld = jnp.mean(kld)
        elif self.reduction == "sum":
            kld = jnp.sum(kld)
        return self.loss_weight * kld


@LOSS_REGISTRY.register()
class CrossEntropyLoss:
    def __init__(self, loss_weight=1.0):
        self.loss_weight = loss_weight

    def __call__(self, logits, labels):
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)
        return self.loss_weight * jnp.mean(nll)


@LOSS_REGISTRY.register()
class SSIMLoss:
    """KAIR SSIM loss (reference train_BSGRAN/models/loss_ssim.py, selectable
    via ``G_lossfn_type: "ssim"``, model_ssl.py:152-153): 11×11 Gaussian
    σ=1.5 window, per-channel depthwise conv with SAME zero padding, C1=1e-4,
    C2=9e-4.  Faithful to the reference: returns the mean SSIM *value*
    (pytorch-ssim convention — callers negate if they want a similarity
    maximizer; KAIR adds it to G_loss as-is)."""

    def __init__(self, loss_weight=1.0, window_size=11, sigma=1.5):
        self.loss_weight = loss_weight
        self.window_size = window_size
        coords = jnp.arange(window_size) - window_size // 2
        g = jnp.exp(-(coords.astype(jnp.float32) ** 2) / (2 * sigma ** 2))
        g = g / g.sum()
        self._window2d = jnp.outer(g, g)

    def _filt(self, x):
        c = x.shape[-1]
        kern = jnp.tile(self._window2d[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
        # torch F.conv2d(padding=k//2) zero-pads
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)

    def __call__(self, pred, target, weight=None):
        mu1 = self._filt(pred)
        mu2 = self._filt(target)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        sigma1_sq = self._filt(pred * pred) - mu1_sq
        sigma2_sq = self._filt(target * target) - mu2_sq
        sigma12 = self._filt(pred * target) - mu1_mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / \
            ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
        return self.loss_weight * jnp.mean(ssim_map)


@LOSS_REGISTRY.register()
class CosineDistanceLoss:
    """1 - cosine_similarity on the last axis, averaged (reference
    diffusion-tree basic_loss.py:613-620).  torch cosine_similarity clamps
    the norm product at eps=1e-8."""

    def __init__(self, loss_weight=0.1):
        self.loss_weight = loss_weight

    def __call__(self, x, y):
        num = jnp.sum(x * y, axis=-1)
        den = jnp.maximum(jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(y, axis=-1),
                          1e-8)
        return jnp.mean(1.0 - num / den) * self.loss_weight


@LOSS_REGISTRY.register()
class BCELoss:
    """Binary cross-entropy on probabilities (reference basic_loss.py:623-631;
    torch nn.BCELoss clamps log terms at -100)."""

    def __init__(self, loss_weight=0.1, reduction="mean"):
        self.loss_weight, self.reduction = loss_weight, reduction

    def __call__(self, x, y):
        bce = -(y * jnp.maximum(jnp.log(x), -100.0) +
                (1 - y) * jnp.maximum(jnp.log1p(-x), -100.0))
        if self.reduction == "mean":
            bce = jnp.mean(bce)
        elif self.reduction == "sum":
            bce = jnp.sum(bce)
        return self.loss_weight * bce


@LOSS_REGISTRY.register()
class KLDistanceLoss1:
    """log-target KL variant (reference basic_loss.py:648-661):
    kl_div(log clamp(x,1e-25), log clamp(y,1e-25), log_target=True)."""

    def __init__(self, loss_weight=0.1, reduction="mean", softmax=False):
        self.loss_weight, self.reduction, self.softmax = loss_weight, reduction, softmax

    def __call__(self, x, y):
        if self.softmax:
            x = jax.nn.softmax(x, axis=-1)
            y = jax.nn.softmax(y, axis=-1)
        logx = jnp.log(jnp.clip(x, min=1e-25))
        logy = jnp.log(jnp.clip(y, min=1e-25))
        kld = jnp.exp(logy) * (logy - logx)
        if self.reduction == "mean":
            kld = jnp.mean(kld)
        elif self.reduction == "sum":
            kld = jnp.sum(kld)
        return self.loss_weight * kld


@LOSS_REGISTRY.register()
class MaxDistanceLoss:
    """max |x-y|, divided by numel under 'mean' (reference
    basic_loss.py:663-676 — the reduction divides the MAX, quirk preserved)."""

    def __init__(self, loss_weight=0.1, reduction="mean"):
        self.loss_weight, self.reduction = loss_weight, reduction

    def __call__(self, x, y):
        md = jnp.max(jnp.abs(x - y))
        if self.reduction == "mean":
            md = md / x.size
        return self.loss_weight * md


@LOSS_REGISTRY.register()
class SmoothL2Loss:
    """reference basic_loss.py:678-693 — where(|d|>delta, d²/2,
    |delta·|d| − delta²/2|), sum-reduced then divided by numel for 'mean'.
    Two reference quirks preserved: the inner abs of the small branch, and
    ``loss_weight`` being stored but NEVER applied (its forward returns the
    raw reduction)."""

    def __init__(self, delta=0.1, loss_weight=1.0, reduction="mean"):
        self.delta, self.loss_weight, self.reduction = delta, loss_weight, reduction

    def __call__(self, x, y):
        d = x - y
        small = jnp.abs(self.delta * jnp.abs(d) - 0.5 * self.delta ** 2)
        v = jnp.where(jnp.abs(d) > self.delta, 0.5 * d ** 2, small)
        total = jnp.sum(v)
        if self.reduction == "mean":
            total = total / x.size
        return total
