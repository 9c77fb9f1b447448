"""SRGAN / ESRGAN recipes (reference: models/srgan_model.py, esrgan_model.py).

One jitted train step containing both the G and D updates: G gradients are
taken w.r.t. params_g only (D frozen by construction — no requires_grad
flipping needed), then D gradients w.r.t. params_d with the SR output
stop-gradiented.  The reference's two separate D backwards (esrgan_model.py /
esrganssl_model.py:251-274) were a DDP-BatchNorm workaround; mathematically
they equal the single combined loss used here."""

from __future__ import annotations

from copy import deepcopy
from typing import Any

import jax
import jax.numpy as jnp

from ssl_tpu.archs import build_network
from ssl_tpu.losses import build_loss
from ssl_tpu.models.base_model import TrainState, build_optimizer, ema_update
from ssl_tpu.models.lr_scheduler import build_schedule
from ssl_tpu.models.sr_model import SRModel
from ssl_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class SRGANModel(SRModel):
    relativistic = False

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.net_d = build_network(deepcopy(opt["network_d"])) if opt.get("network_d") else None
        train_opt = opt.get("train") or {}
        if self.is_train and self.net_d is not None:
            self.schedule_d = build_schedule(train_opt, train_opt["optim_d"].get("lr", 1e-4))
            self.tx_d = build_optimizer(train_opt["optim_d"], self.schedule_d)
            self.cri_gan = build_loss(train_opt["gan_opt"]) if train_opt.get("gan_opt") else None
            self.net_d_iters = train_opt.get("net_d_iters", 1)
            self.net_d_init_iters = train_opt.get("net_d_init_iters", 0)
        # stacked real+fake D dispatch (see apply_d_pair; measured slower on
        # v5e, default off = reference's serial two-call trajectory)
        self.fuse_d_batch = train_opt.get("fuse_d_batch", False)

    # -------------------------------------------------------------- state init
    def init_state(self, lq_shape=(1, 32, 32, 3), seed: int = 0) -> TrainState:
        state = super().init_state(lq_shape, seed)
        if self.net_d is None:
            return state
        gt_shape = self.d_init_shape(lq_shape)
        var_d = jax.jit(self.net_d.init)(jax.random.PRNGKey(seed + 1), jnp.zeros(gt_shape, jnp.float32))
        params_d = var_d["params"]
        stats_d = var_d.get("batch_stats", {})
        params_d, stats_d = self._load_pretrain_d(params_d, stats_d)
        return state.replace(params_d=params_d, stats_d=stats_d,
                             opt_state_d=self.tx_d.init(params_d))

    def _load_pretrain_d(self, params_d, stats_d):
        """Load pretrain_network_d if given (reference srgan_model.py:29-35);
        torch .pth via the per-arch converters, incl. SN/BN stats when the
        layout carries them."""
        path = (self.opt.get("path") or {}).get("pretrain_network_d")
        if not path:
            return params_d, stats_d
        from ssl_tpu.utils.weight_port import (load_params_auto, load_torch_state_dict,
                                               sn_batch_stats_from_torch,
                                               vgg_disc_batch_stats)
        key = self.opt["path"].get("param_key_d", "params")
        loaded = load_params_auto(path, param_key=key, reference_tree=params_d)
        if loaded is None:
            raise ValueError(
                f"pretrain_network_d={path}: no converter produced a tree "
                "matching network_d — refusing silent random-init fallback.")
        if path.endswith((".pth", ".pt")) and stats_d:
            sd = load_torch_state_dict(path, key)
            if any(k.endswith("weight_orig") for k in sd):
                stats_d = sn_batch_stats_from_torch(sd, stats_d)
            elif any(k.endswith("running_mean") for k in sd):
                stats_d = vgg_disc_batch_stats(sd, stats_d)
        return loaded, stats_d

    # ----------------------------------------------------------------- helpers
    def apply_d(self, params_d, stats_d, x, train=True, mutable=False):
        variables = {"params": params_d, "batch_stats": stats_d}
        if mutable:
            out, new_vars = self.net_d.apply(variables, x, train, mutable=["batch_stats"])
            return out, new_vars.get("batch_stats", stats_d)
        return self.net_d.apply(variables, x, train), stats_d

    def apply_d_pair(self, params_d, stats_d, a, b, train=True):
        """D on two same-shape batches as ONE stacked call (TPU-native: twice
        the matmul batch per dispatch instead of two serial chains).

        Returns (pred_a, pred_b, new_stats).  The reference runs the two
        forwards serially, so its SN power iteration advances once per
        sub-batch (the fake pass sees the post-real-update u); stacked, both
        share the pre-call u and the iteration advances once per call — the
        same fixed point, one step behind.

        Default OFF: on v5e at the bench config the stacked b=32 D phase
        measured SLOWER than the two serial b=16 chains (118.7 vs 107.6
        ms/step, reproduced twice — the wider backward schedules worse), and
        serial is also the reference-exact trajectory.  The knob
        (``train.fuse_d_batch: true``) stays for other shapes/hardware;
        equivalence is pinned by test_fused_d_pair_matches_serial."""
        if not self.fuse_d_batch:
            pred_a, stats1 = self.apply_d(params_d, stats_d, a, train=train, mutable=True)
            pred_b, stats2 = self.apply_d(params_d, stats1, b, train=train, mutable=True)
            return pred_a, pred_b, stats2
        out, stats = self.apply_d(params_d, stats_d,
                                  jnp.concatenate([a, b], axis=0),
                                  train=train, mutable=True)
        n = a.shape[0]
        return out[:n], out[n:], stats

    def d_init_shape(self, lq_shape):
        """Shape of the D's init input given the G's lq input shape."""
        return (lq_shape[0], lq_shape[1] * self.scale, lq_shape[2] * self.scale, lq_shape[3])

    def d_view(self, x):
        """Hook: reshape an image batch for the discriminator.  Video GAN
        recipes flatten the temporal axis here — the reference's
        ``output.view(-1, c, h, w)`` (video_recurrent_gan_model.py:140)."""
        return x

    def gan_g_loss(self, fake_pred, real_pred):
        if self.relativistic:
            real_pred = jax.lax.stop_gradient(real_pred)
            l_g_real = self.cri_gan(real_pred - jnp.mean(fake_pred), False, is_disc=False)
            l_g_fake = self.cri_gan(fake_pred - jnp.mean(real_pred), True, is_disc=False)
            return (l_g_real + l_g_fake) / 2
        return self.cri_gan(fake_pred, True, is_disc=False)

    def gan_d_loss(self, real_pred, fake_pred):
        if self.relativistic:
            l_d_real = self.cri_gan(real_pred - jnp.mean(jax.lax.stop_gradient(fake_pred)),
                                    True, is_disc=True) * 0.5
            l_d_fake = self.cri_gan(fake_pred - jnp.mean(jax.lax.stop_gradient(real_pred)),
                                    False, is_disc=True) * 0.5
            return l_d_real + l_d_fake, {"l_d_real": l_d_real, "l_d_fake": l_d_fake}
        l_d_real = self.cri_gan(real_pred, True, is_disc=True)
        l_d_fake = self.cri_gan(fake_pred, False, is_disc=True)
        return l_d_real + l_d_fake, {"l_d_real": l_d_real, "l_d_fake": l_d_fake}

    # -------------------------------------------------- generator loss (hook)
    def g_losses_gan(self, params_g, state: TrainState, batch: dict, rng):
        """Pixel (+ recipe extras) + perceptual + GAN; subclasses extend."""
        total, logs, sr = self.g_losses(params_g, state, batch, rng)
        if self.cri_gan is not None:
            # train-mode D (batch statistics), but stat updates are discarded
            # in the G phase — the D phase owns the stats.  Deliberately NOT
            # a stacked pair here: only the sr half needs a backward, and a
            # fused concat would drag the gt half through the D input-grad
            # too (measured 148->130 imgs/s when tried).
            fake_pred, _ = self.apply_d(state.params_d, state.stats_d, self.d_view(sr),
                                        train=True, mutable=True)
            real_pred, _ = self.apply_d(state.params_d, state.stats_d,
                                        self.d_view(batch["gt"]),
                                        train=True, mutable=True)
            l_g_gan = self.gan_g_loss(fake_pred, jax.lax.stop_gradient(real_pred))
            total += l_g_gan
            logs["l_g_gan"] = l_g_gan
        return total, logs, sr

    # --------------------------------------------------- discriminator loss
    def d_losses(self, params_d, state: TrainState, batch: dict, sr_sg):
        """D-phase loss hook: returns (loss, logs, new_stats).  Subclasses
        with conditional/multiscale Ds (HiFaceGAN) override this."""
        real_pred, fake_pred, stats2 = self.apply_d_pair(
            params_d, state.stats_d, self.d_view(batch["gt"]),
            self.d_view(sr_sg), train=True)
        loss, d_logs = self.gan_d_loss(real_pred, fake_pred)
        d_logs["out_d_real"] = jnp.mean(real_pred)
        d_logs["out_d_fake"] = jnp.mean(fake_pred)
        return loss, d_logs, stats2

    # -------------------------------------------------------------- train step
    def make_train_step(self):
        if self.net_d is None:
            return super().make_train_step()

        def step_fn(state: TrainState, batch: dict):
            rng, sub = jax.random.split(state.rng)
            it = state.step + 1

            # ---------------- G phase
            def g_loss_fn(params_g):
                total, logs, sr = self.g_losses_gan(params_g, state, batch, sub)
                return total, (logs, sr)

            (l_g_total, (logs, sr)), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(state.params_g)
            grads_g = self.adjust_grads_g(grads_g, state)
            do_g = jnp.logical_and(it % self.net_d_iters == 0, it > self.net_d_init_iters)
            scale_g = do_g.astype(jnp.float32)
            grads_g = jax.tree_util.tree_map(lambda g: g * scale_g, grads_g)
            updates_g, opt_state_g = self.tx_g.update(grads_g, state.opt_state_g, state.params_g)
            updates_g = self.adjust_updates_g(updates_g, state)
            params_g = jax.tree_util.tree_map(
                lambda p, u: p + u * scale_g, state.params_g, updates_g)

            # ---------------- D phase
            sr_sg = jax.lax.stop_gradient(sr)

            def d_loss_fn(params_d):
                loss, d_logs, stats2 = self.d_losses(params_d, state, batch, sr_sg)
                return loss, (d_logs, stats2)

            (l_d, (d_logs, stats_d)), grads_d = jax.value_and_grad(d_loss_fn, has_aux=True)(state.params_d)
            updates_d, opt_state_d = self.tx_d.update(grads_d, state.opt_state_d, state.params_d)
            params_d = jax.tree_util.tree_map(lambda p, u: p + u, state.params_d, updates_d)

            ema = state.ema_params_g
            if self.ema_decay > 0:
                ema = ema_update(ema, params_g, self.ema_decay)

            logs.update(d_logs)
            logs["l_g_total"] = l_g_total
            logs["lr"] = self.schedule_g(state.step)
            new_state = state.replace(step=it, rng=rng, params_g=params_g,
                                      opt_state_g=opt_state_g, ema_params_g=ema,
                                      params_d=params_d, stats_d=stats_d,
                                      opt_state_d=opt_state_d)
            return new_state, logs
        return step_fn


@MODEL_REGISTRY.register()
class ESRGANModel(SRGANModel):
    """Relativistic-GAN variant (reference models/esrgan_model.py)."""
    relativistic = True
