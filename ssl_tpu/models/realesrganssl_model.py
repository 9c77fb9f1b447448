"""RealESRGAN(-SSL) recipes with the blind two-stage degradation pipeline.

Reference parity: models/realesrganssl_model.py:23-793 and realesrgan_model.py.
The on-GPU no-grad degradation becomes a host-side pipeline stage
(`prepare_batch`) feeding the same jitted GAN(+SSL) train step; the 180-slot
training-pair pool and USM sharpening ride along (SURVEY §3.2)."""

from __future__ import annotations

import numpy as np

from ssl_tpu.data.realesr_degradation import RealESRGANDegrader
from ssl_tpu.models.esrganssl_model import ESRGANSSLModel
from ssl_tpu.models.srgan_model import SRGANModel
from ssl_tpu.models.sr_model import SRModel
from ssl_tpu.utils.registry import MODEL_REGISTRY


class _DegradationMixin:
    """Adds host-side degradation + queue to a recipe."""

    def _init_degrader(self, opt: dict):
        train_ds = (opt.get("datasets") or {}).get("train") or {}
        self.gt_size = train_ds.get("gt_size", 256)
        self.degrader = RealESRGANDegrader(
            opt,
            scale=opt.get("scale", 4),
            queue_size=opt.get("queue_size", 180),
            use_sharpen=opt.get("Use_sharpen") is not None,
            sharpen_before=bool(opt.get("Sharpen_before_degra")),
            degradation_order=opt.get("degradation_order", "two"),
            seed=opt.get("manual_seed"),
        )
        self.l1_gt_usm = opt.get("l1_gt_usm", True)
        self.percep_gt_usm = opt.get("percep_gt_usm", True)
        self.gan_gt_usm = opt.get("gan_gt_usm", False)

    def prepare_batch(self, batch: dict) -> dict:
        """Host-side feed_data: degrade + crop + queue (+USM). Call before
        train_step with raw dataset batches (gt/kernels[/mask])."""
        if "lq" in batch:  # already paired (e.g. validation)
            return batch
        batch = dict(batch)
        batch["gt_size"] = self.gt_size
        out = self.degrader({k: np.asarray(v) for k, v in batch.items()
                             if isinstance(v, np.ndarray)} | {"gt_size": self.gt_size})
        return out


@MODEL_REGISTRY.register()
class RealESRGANModel(_DegradationMixin, SRGANModel):
    """Non-SSL RealESRGAN (reference realesrgan_model.py): degradation + UNet-SN D."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self._init_degrader(opt)


@MODEL_REGISTRY.register()
class RealESRGANSSLModel(_DegradationMixin, ESRGANSSLModel):
    """RealESRGAN + SSL penalty (reference realesrganssl_model.py)."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self._init_degrader(opt)

    def g_losses(self, params_g, state, batch, rng):
        """Same as ESRGANSSL but honoring the *_gt_usm switches: pixel and
        perceptual losses may target the sharpened GT (reference :369-384)."""
        import jax.numpy as jnp
        sr = self.net_g.apply({"params": params_g}, batch["lq"])
        gt = batch["gt"]
        gt_usm = batch.get("gt_usm", gt)
        total = 0.0
        logs = {}
        if self.cri_pix is not None:
            l_pix = self.cri_pix(sr, gt_usm if self.l1_gt_usm else gt)
            total += l_pix
            logs["l_pix"] = l_pix
        if self.use_ssl and "gt_mask" in batch:
            from ssl_tpu.losses.ssl_loss import ssl_loss
            l_ss, l_kl = ssl_loss(sr, gt, batch["gt_mask"], self.ssl_setting)
            if self.ssl_setting.l1_weight > 0:
                total += l_ss
                logs["l_selfsim"] = l_ss
            if self.ssl_setting.kl_weight > 0:
                total += l_kl
                logs["l_selfsim_kl"] = l_kl
        if self.cri_perceptual is not None:
            l_percep, l_style = self.cri_perceptual(sr, gt_usm if self.percep_gt_usm else gt)
            total += l_percep + l_style
            logs["l_percep"] = l_percep
        return total, logs, sr


@MODEL_REGISTRY.register()
class RealESRNetSSLModel(_DegradationMixin, SRModel):
    """Degradation + pixel-only pretraining stage (RealESRNet flavor)."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self._init_degrader(opt)
