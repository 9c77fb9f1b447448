"""BebyGAN-SSL: best-buddy pixel loss + back-projection + SSL
(reference: models/bebyganssl_model.py:567-1113)."""

from __future__ import annotations

import jax.numpy as jnp

from ssl_tpu.losses.bbl import back_projection_loss, best_buddy_pairs
from ssl_tpu.models.esrganssl_model import ESRGANSSLModel
from ssl_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class BebyGANSSLModel(ESRGANSSLModel):

    def __init__(self, opt: dict):
        super().__init__(opt)
        train_opt = opt.get("train") or {}
        bb = train_opt.get("bbl_opt") or {}
        self.bbl_weight = bb.get("loss_weight", 1.0)
        self.bbl_alpha = bb.get("alpha", 1.0)
        self.bbl_beta = bb.get("beta", 1.0)
        self.bbl_ksize = bb.get("ksize", 3)
        self.bbl_stride = bb.get("stride", 3)
        bp = train_opt.get("back_projection_opt") or {}
        self.bp_weight = bp.get("loss_weight", 1.0)

    def g_losses(self, params_g, state, batch, rng):
        total, logs, sr = super().g_losses(params_g, state, batch, rng)
        if self.bbl_weight > 0:
            p1, sel = best_buddy_pairs(sr, batch["gt"], self.bbl_alpha, self.bbl_beta,
                                       self.bbl_ksize, self.bbl_stride)
            l_bbl = self.bbl_weight * jnp.mean(jnp.abs(p1 - sel))
            total += l_bbl
            logs["l_g_bbl"] = l_bbl
        if self.bp_weight > 0 and "lq" in batch:
            l_bp = self.bp_weight * back_projection_loss(sr, batch["lq"])
            total += l_bp
            logs["l_g_bp"] = l_bp
        return total, logs, sr


@MODEL_REGISTRY.register()
class BebyGANModel(BebyGANSSLModel):
    """Plain BebyGAN (reference bebygan_model.py:15): the SSL-less original —
    BBL pixel term + back-projection + perceptual + GAN.  Identical recipe
    with the SSL terms disabled (use_ssl is False when no ssl_setting is
    configured)."""
