"""RankSRGAN-SSL: frozen Ranker network + rank loss + SSL
(reference: models/ranksrganssl_model.py:19-593).

Reference quirk preserved: the rank score is computed under no_grad
(:191-198) — the rank term is logged and added to the total but contributes
ZERO gradient to G.  Mirrored here with stop_gradient and documented."""

from __future__ import annotations

from copy import deepcopy

import jax
import jax.numpy as jnp

from ssl_tpu.archs import build_network
from ssl_tpu.models.esrganssl_model import ESRGANSSLModel
from ssl_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class RankSRGANSSLModel(ESRGANSSLModel):

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.net_r = build_network(deepcopy(opt["network_r"])) if opt.get("network_r") else None
        train_opt = opt.get("train") or {}
        rank_opt = train_opt.get("rank_opt") or {}
        self.rank_weight = rank_opt.get("loss_weight", 0.0)
        self.rank_bias = rank_opt.get("R_bias", 0.0)
        self._ranker_vars = None

    def init_state(self, lq_shape=(1, 32, 32, 3), seed: int = 0):
        state = super().init_state(lq_shape, seed)
        if self.net_r is not None:
            gt_shape = (lq_shape[0], lq_shape[1] * self.scale, lq_shape[2] * self.scale, 3)
            var_r = jax.jit(self.net_r.init)(jax.random.PRNGKey(seed + 2),
                                             jnp.zeros(gt_shape, jnp.float32))
            # frozen ranker params live in state.extra (restored with the state;
            # pretrained ranker weights load via path.pretrain_network_r)
            params_r = var_r["params"]
            stats_r = var_r.get("batch_stats", {})
            path = (self.opt.get("path") or {}).get("pretrain_network_r")
            if path:
                from ssl_tpu.utils.weight_port import (load_params_auto,
                                                       load_torch_state_dict,
                                                       ranker_batch_stats)
                loaded = load_params_auto(path, "params", params_r)
                if loaded is None:
                    raise ValueError(
                        f"pretrain_network_r={path}: conversion failed — the "
                        "frozen Ranker must not run at random init.")
                params_r = loaded
                if path.endswith((".pth", ".pt")) and stats_r:
                    stats_r = ranker_batch_stats(
                        load_torch_state_dict(path, "params"), stats_r)
            state = state.replace(extra={"params_r": params_r,
                                         "stats_r": stats_r})
        return state

    def g_losses(self, params_g, state, batch, rng):
        total, logs, sr = super().g_losses(params_g, state, batch, rng)
        if self.net_r is not None and self.rank_weight > 0:
            score = self.net_r.apply(
                {"params": state.extra["params_r"], "batch_stats": state.extra["stats_r"]},
                sr, False)
            score = jax.lax.stop_gradient(score)  # reference computes under no_grad
            l_g_rank = self.rank_weight * jnp.sum(jax.nn.sigmoid(score - self.rank_bias))
            total += l_g_rank
            logs["l_g_rank"] = l_g_rank
        return total, logs, sr
