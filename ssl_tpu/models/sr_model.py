"""SRModel — the base SR training recipe (reference: models/sr_model.py).

G-only training: pixel + optional perceptual loss, EMA, validation with the
metric registry, tiled inference for large images.  The whole optimization is
one jitted ``train_step``; validation forwards pad inputs to a size multiple
to bound XLA recompiles (TPU static shapes)."""

from __future__ import annotations

import os
from copy import deepcopy
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ssl_tpu.losses import build_loss
from ssl_tpu.metrics import calculate_metric
from ssl_tpu.models.base_model import BaseModel, TrainState, build_optimizer, ema_update
from ssl_tpu.models.lr_scheduler import build_schedule
from ssl_tpu.utils.img_util import array2img, imwrite
from ssl_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class SRModel(BaseModel):

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.net_g = self.build_g()
        train_opt = opt.get("train") or {}
        self.train_opt = train_opt
        self.ema_decay = train_opt.get("ema_decay", 0)
        if self.is_train:
            self.schedule_g = build_schedule(train_opt, train_opt["optim_g"].get("lr", 1e-4))
            self.tx_g = build_optimizer(train_opt["optim_g"], self.schedule_g)
            self.cri_pix = build_loss(train_opt["pixel_opt"]) if train_opt.get("pixel_opt") else None
            self.cri_perceptual = build_loss(train_opt["perceptual_opt"]) if train_opt.get("perceptual_opt") else None
            if self.cri_pix is None and self.cri_perceptual is None:
                raise ValueError("Both pixel and perceptual losses are None.")
        self.best_metric_results: dict = {}
        self._g_apply = None

    # -------------------------------------------------------------- state init
    def init_state(self, lq_shape=(1, 32, 32, 3), seed: int = 0) -> TrainState:
        # jitted init: one compiled program instead of per-op eager dispatch
        # (the axon-tunneled TPU has high per-op latency)
        variables = jax.jit(self.net_g.init)(jax.random.PRNGKey(seed), jnp.zeros(lq_shape, jnp.float32))
        params_g = variables["params"]
        params_g = self.load_pretrain(params_g)
        opt_state_g = self.tx_g.init(params_g) if self.is_train else None
        # EMA starts as a *copy* (distinct buffers: donation-safe under jit)
        ema = jax.tree_util.tree_map(jnp.copy, params_g) if (self.ema_decay > 0) else None
        return TrainState(step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(self.opt.get("manual_seed", 0) or 0),
                          params_g=params_g, opt_state_g=opt_state_g, ema_params_g=ema)

    def load_pretrain(self, params_g):
        """Load pretrain_network_g if given (pickle tree or torch .pth via converter).

        A configured pretrain path that exists but cannot be converted is an
        ERROR — silently training from random init would corrupt a finetune
        (reference load_network is strict=True by default, base_model.py:289)."""
        path = (self.opt.get("path") or {}).get("pretrain_network_g")
        if not path:
            return params_g
        if not os.path.exists(path):
            raise FileNotFoundError(f"pretrain_network_g not found: {path}")
        from ssl_tpu.utils.weight_port import load_params_auto
        param_key = (self.opt.get("path") or {}).get("param_key_g", "params")
        loaded = load_params_auto(path, param_key=param_key, reference_tree=params_g)
        if loaded is None:
            raise ValueError(
                f"pretrain_network_g={path}: no weight converter produced a "
                "tree matching network_g — refusing to train from random init. "
                "(set path.pretrain_network_g: ~ to train from scratch)")
        return loaded

    # ------------------------------------------------------------------ losses
    def g_losses(self, params_g, state: TrainState, batch: dict, rng) -> tuple[jnp.ndarray, dict, Any]:
        sr = self.net_g.apply({"params": params_g}, batch["lq"])
        total = 0.0
        logs = {}
        if self.cri_pix is not None:
            l_pix = self.cri_pix(sr, batch["gt"])
            total += l_pix
            logs["l_pix"] = l_pix
        if self.cri_perceptual is not None:
            l_percep, l_style = self.cri_perceptual(sr, batch["gt"])
            total += l_percep + l_style
            logs["l_percep"] = l_percep
        return total, logs, sr

    # ------------------------------------------------- grad/update hooks
    def adjust_grads_g(self, grads, state: TrainState):
        """Hook: mask/scale G gradients inside the jitted step.  Video
        recipes use it for step-conditioned freezes (fix_flow/tsa_iter —
        the reference's requires_grad flipping, video_recurrent_model.py:52,
        edvr_model.py:48) without recompiling."""
        return grads

    def adjust_updates_g(self, updates, state: TrainState):
        """Hook: scale optimizer updates per param subtree (the reference's
        per-param-group lr multipliers: flow_lr_mul/dcn_lr_mul)."""
        return updates

    # -------------------------------------------------------------- train step
    def make_train_step(self):
        def step_fn(state: TrainState, batch: dict):
            rng, sub = jax.random.split(state.rng)

            def loss_fn(params_g):
                total, logs, sr = self.g_losses(params_g, state, batch, sub)
                return total, (logs, sr)

            (total, (logs, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params_g)
            grads = self.adjust_grads_g(grads, state)
            updates, opt_state_g = self.tx_g.update(grads, state.opt_state_g, state.params_g)
            updates = self.adjust_updates_g(updates, state)
            params_g = jax.tree_util.tree_map(lambda p, u: p + u, state.params_g, updates)
            ema = state.ema_params_g
            if self.ema_decay > 0:
                ema = ema_update(ema, params_g, self.ema_decay)
            logs["l_total"] = total
            logs["lr"] = self.schedule_g(state.step)
            new_state = state.replace(step=state.step + 1, rng=rng, params_g=params_g,
                                      opt_state_g=opt_state_g, ema_params_g=ema)
            return new_state, logs
        return step_fn

    def train_step(self, state: TrainState, batch: dict):
        if self._train_step is None:
            self._train_step = jax.jit(self.make_train_step(), donate_argnums=(0,))
        return self._train_step(state, batch)

    # --------------------------------------------------------------- inference
    def _apply_g(self, params, lq):
        if self._g_apply is None:
            self._g_apply = jax.jit(lambda p, x: self.net_g.apply({"params": p}, x))
        lq = self._match_param_devices(params, lq)
        return self._g_apply(params, lq)

    def infer_params(self, state: TrainState):
        return state.ema_params_g if state.ema_params_g is not None else state.params_g

    def test(self, state: TrainState, lq: np.ndarray) -> np.ndarray:
        """EMA forward with pad-to-multiple for shape stability + optional tiling.

        Reference: esrganssl_model.py test()/tile_process (:290-384)."""
        params = self.infer_params(state)
        lq = np.asarray(lq, np.float32)
        if lq.ndim == 3:
            lq = lq[None]
        if self.opt.get("tile_process"):
            return self.tile_process(params, lq)
        if self.opt.get("spatial_infer"):
            # multi-chip halo-exchange sharding (parallel/spatial.py) — the
            # TPU-native big-image path; halo plays tile_pad's role
            from ssl_tpu.parallel.spatial import spatial_infer
            apply_fn = lambda p, x: self.net_g.apply({"params": p}, x)
            return np.asarray(spatial_infer(
                apply_fn, params, jnp.asarray(lq), self.scale,
                halo=int(self.opt.get("spatial_halo", 32))))
        mult = 16
        b, h, w, c = lq.shape
        ph = (mult - h % mult) % mult
        pw = (mult - w % mult) % mult
        lq_pad = np.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect") if (ph or pw) else lq
        sr = np.asarray(self._apply_g(params, jnp.asarray(lq_pad)))
        return sr[:, : h * self.scale, : w * self.scale, :]

    def tile_process(self, params, lq: np.ndarray) -> np.ndarray:
        """Halo-overlap tiling (reference tile_process :290-356): process fixed
        tile_size tiles with tile_pad halo, stitch the centers."""
        tile_size = self.opt.get("tile_size", 400)
        tile_pad = self.opt.get("tile_pad", 32)
        scale = self.scale
        b, h, w, c = lq.shape
        out = np.zeros((b, h * scale, w * scale, c), np.float32)
        tiles_y = int(np.ceil(h / tile_size))
        tiles_x = int(np.ceil(w / tile_size))
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                y0, x0 = ty * tile_size, tx * tile_size
                y1, x1 = min(y0 + tile_size, h), min(x0 + tile_size, w)
                yp0, xp0 = max(y0 - tile_pad, 0), max(x0 - tile_pad, 0)
                yp1, xp1 = min(y1 + tile_pad, h), min(x1 + tile_pad, w)
                tile = lq[:, yp0:yp1, xp0:xp1, :]
                # pad to the max padded-tile size for shape reuse
                target_h, target_w = tile_size + 2 * tile_pad, tile_size + 2 * tile_pad
                eh, ew = target_h - tile.shape[1], target_w - tile.shape[2]
                tile_in = np.pad(tile, ((0, 0), (0, eh), (0, ew), (0, 0)), mode="reflect") \
                    if (eh or ew) else tile
                sr_tile = np.asarray(self._apply_g(params, jnp.asarray(tile_in)))
                sr_tile = sr_tile[:, : tile.shape[1] * scale, : tile.shape[2] * scale, :]
                oy0, ox0 = (y0 - yp0) * scale, (x0 - xp0) * scale
                out[:, y0 * scale:y1 * scale, x0 * scale:x1 * scale, :] = \
                    sr_tile[:, oy0:oy0 + (y1 - y0) * scale, ox0:ox0 + (x1 - x0) * scale, :]
        return out

    # -------------------------------------------------------------- validation
    def validation(self, state: TrainState, dataloader, current_iter, tb_logger=None,
                   save_img=False):
        dataset_name = dataloader.dataset.opt.get("name", "val")
        metric_opts = (self.opt.get("val") or {}).get("metrics") or {}
        results = {name: [] for name in metric_opts}
        for batch in dataloader:
            # Per-image metric protocol (reference nondist_validation) — a val
            # batch >1 would silently drop images below, so refuse it loudly.
            if np.asarray(batch["lq"]).shape[0] != 1:
                raise ValueError(
                    f"validation expects batch_size_per_gpu=1 for val loaders, got "
                    f"{np.asarray(batch['lq']).shape[0]} (dataset {dataset_name!r})")
            sr = self.test(state, batch["lq"])
            # Metric boundary convention: RGB uint8.  to_y_channel uses RGB
            # (rgb2ycbcr) coefficients and calculate_lpips/dists expect RGB,
            # so metrics must NOT receive the BGR layout cv2.imwrite wants
            # (reference feeds BGR but compensates with bgr2ycbcr + an
            # internal BGR->RGB flip in its lpips/dists wrappers).
            sr_img = array2img(sr[0], rgb2bgr=False)
            gt_img = array2img(batch["gt"][0], rgb2bgr=False) if "gt" in batch else None
            if save_img:
                img_name = os.path.splitext(os.path.basename(batch["lq_path"][0]))[0]
                save_path = os.path.join(self.opt["path"]["visualization"], dataset_name,
                                         f"{img_name}_{current_iter}.png")
                imwrite(sr_img[..., ::-1] if sr_img.ndim == 3 else sr_img, save_path)
            for name, m_opt in metric_opts.items():
                if gt_img is not None:
                    results[name].append(calculate_metric({"img": sr_img, "img2": gt_img}, m_opt))
        avg = {name: float(np.mean(vals)) for name, vals in results.items() if vals}
        self._update_best(dataset_name, avg, current_iter, metric_opts)
        if tb_logger is not None:
            for name, val in avg.items():
                tb_logger.add_scalar(f"metrics/{dataset_name}/{name}", val, current_iter)
        return avg

    def _update_best(self, dataset_name, avg, current_iter, metric_opts):
        rec = self.best_metric_results.setdefault(dataset_name, {})
        for name, val in avg.items():
            better = (metric_opts.get(name) or {}).get("better", "higher")
            cur = rec.get(name)
            if cur is None or (better == "higher" and val > cur["val"]) or \
                    (better == "lower" and val < cur["val"]):
                rec[name] = {"val": val, "iter": current_iter}


# RealESRNetModel (degradation + pixel-only loss, reference realesrnet_model.py)
# lives in realesrganssl_model.py next to the _DegradationMixin it needs.
