"""LDL-SSL: EMA-refined artifact-map weighted pixel loss + SSL
(reference: models/ldlssl_model.py:19-555, LDL method CVPR'22).

The artifact map compares the current output against the EMA model's output;
pixels where the live model is *worse* than EMA get variance-scaled weights on
an extra L1 term (reference :221-225)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssl_tpu.losses import build_loss
from ssl_tpu.losses.loss_util import get_refined_artifact_map
from ssl_tpu.models.esrganssl_model import ESRGANSSLModel
from ssl_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class LDLSSLModel(ESRGANSSLModel):

    def __init__(self, opt: dict):
        super().__init__(opt)
        train_opt = opt.get("train") or {}
        self.cri_artifacts = build_loss(train_opt["artifacts_opt"]) \
            if train_opt.get("artifacts_opt") else None
        self.ldl_ksize = train_opt.get("ldl_ksize", 7)

    def g_losses(self, params_g, state, batch, rng):
        total, logs, sr = super().g_losses(params_g, state, batch, rng)
        if self.cri_artifacts is not None and state.ema_params_g is not None:
            sr_ema = jax.lax.stop_gradient(
                self.net_g.apply({"params": state.ema_params_g}, batch["lq"]))
            pixel_weight = jax.lax.stop_gradient(
                get_refined_artifact_map(batch["gt"], sr, sr_ema, self.ldl_ksize))
            l_g_artifacts = self.cri_artifacts(pixel_weight * sr, pixel_weight * batch["gt"])
            total += l_g_artifacts
            logs["l_g_artifacts"] = l_g_artifacts
        return total, logs, sr
