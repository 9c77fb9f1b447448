"""ESRGAN-SSL — the canonical SSL training recipe
(reference: models/esrganssl_model.py:18-540).

G losses: weighted pixel L1 + SSG-L1 + SSG-KL + VGG perceptual + relativistic
GAN; alternating D; EMA.  The reference's per-image Python SSL loop
(:158-209) is replaced by the vmapped fixed-capacity ``ssl_loss`` so the whole
optimization is one compiled XLA program."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssl_tpu.losses.ssl_loss import ssl_loss, ssl_setting_from_opt
from ssl_tpu.models.srgan_model import ESRGANModel
from ssl_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class ESRGANSSLModel(ESRGANModel):

    def __init__(self, opt: dict):
        super().__init__(opt)
        gt_size = ((opt.get("datasets") or {}).get("train") or {}).get("gt_size")
        self.ssl_setting = ssl_setting_from_opt(opt, gt_size=gt_size)
        self.use_ssl = bool(opt.get("ssl_setting")) and (
            self.ssl_setting.l1_weight > 0 or self.ssl_setting.kl_weight > 0)

    def g_losses(self, params_g, state, batch, rng):
        total, logs, sr = super().g_losses(params_g, state, batch, rng)
        if self.use_ssl and "gt_mask" in batch:
            l_selfsim, l_selfsim_kl = ssl_loss(sr, batch["gt"], batch["gt_mask"], self.ssl_setting)
            if self.ssl_setting.l1_weight > 0:
                total += l_selfsim
                logs["l_selfsim"] = l_selfsim
            if self.ssl_setting.kl_weight > 0:
                total += l_selfsim_kl
                logs["l_selfsim_kl"] = l_selfsim_kl
        return total, logs, sr
