"""SPSR-SSL: dual-branch generator + image D + gradient D + SSL
(reference: models/spsrssl_model.py:96-736).

G losses: pixel L1 on SR, gradient-map L1s (grad(SR) vs grad(GT) and the
gradient branch output vs grad(GT)), perceptual, relativistic GAN on the
image D AND on the gradient D, SSL on SR.  Both discriminators update in the
same jitted step (params_d is a {'img','grad'} tree)."""

from __future__ import annotations

from copy import deepcopy

import jax
import jax.numpy as jnp

from ssl_tpu.archs import build_network
from ssl_tpu.archs.spsr_arch import image_gradient
from ssl_tpu.losses.ssl_loss import ssl_loss
from ssl_tpu.models.base_model import TrainState, ema_update
from ssl_tpu.models.esrganssl_model import ESRGANSSLModel
from ssl_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class SPSRSSLModel(ESRGANSSLModel):

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.net_d_grad = build_network(deepcopy(opt["network_d_grad"])) \
            if opt.get("network_d_grad") else None
        train_opt = opt.get("train") or {}
        self.grad_pix_weight = (train_opt.get("gradient_pixel_opt") or {}).get("loss_weight", 1.0)
        self.grad_branch_weight = (train_opt.get("gradient_branch_opt") or {}).get("loss_weight", 0.5)

    # generator forward returns a tuple; keep the SR image for shared code
    def init_state(self, lq_shape=(1, 32, 32, 3), seed: int = 0) -> TrainState:
        state = super().init_state(lq_shape, seed)
        if self.net_d_grad is not None:
            gt_shape = (lq_shape[0], lq_shape[1] * self.scale, lq_shape[2] * self.scale, 3)
            var_dg = jax.jit(self.net_d_grad.init)(jax.random.PRNGKey(seed + 3),
                                                   jnp.zeros(gt_shape, jnp.float32))
            params_d = {"img": state.params_d, "grad": var_dg["params"]}
            stats_d = {"img": state.stats_d, "grad": var_dg.get("batch_stats", {})}
            state = state.replace(params_d=params_d, stats_d=stats_d,
                                  opt_state_d=self.tx_d.init(params_d))
        return state

    def apply_d(self, params_d, stats_d, x, train=True, mutable=False, which="img"):
        net = self.net_d if which == "img" else self.net_d_grad
        p = params_d["img" if which == "img" else "grad"] if isinstance(params_d, dict) and "img" in params_d else params_d
        s = stats_d["img" if which == "img" else "grad"] if isinstance(stats_d, dict) and "img" in stats_d else stats_d
        variables = {"params": p, "batch_stats": s}
        if mutable:
            out, new_vars = net.apply(variables, x, train, mutable=["batch_stats"])
            return out, new_vars.get("batch_stats", s)
        return net.apply(variables, x, train), s

    def g_losses_gan(self, params_g, state, batch, rng):
        out_branch, sr, lq_grad = self.net_g.apply({"params": params_g}, batch["lq"])
        gt = batch["gt"]
        gt_grad = image_gradient(gt)
        sr_grad = image_gradient(sr)
        total = 0.0
        logs = {}
        if self.cri_pix is not None:
            l_pix = self.cri_pix(sr, gt)
            total += l_pix
            logs["l_pix"] = l_pix
        # gradient-space pixel losses
        l_grad_pix = self.grad_pix_weight * jnp.mean(jnp.abs(sr_grad - gt_grad))
        l_grad_branch = self.grad_branch_weight * jnp.mean(jnp.abs(out_branch - gt_grad))
        total += l_grad_pix + l_grad_branch
        logs["l_g_grad_pix"] = l_grad_pix
        logs["l_g_grad_branch"] = l_grad_branch
        if self.use_ssl and "gt_mask" in batch:
            l_ss, l_kl = ssl_loss(sr, gt, batch["gt_mask"], self.ssl_setting)
            if self.ssl_setting.l1_weight > 0:
                total += l_ss
                logs["l_selfsim"] = l_ss
            if self.ssl_setting.kl_weight > 0:
                total += l_kl
                logs["l_selfsim_kl"] = l_kl
        if self.cri_perceptual is not None:
            l_percep, l_style = self.cri_perceptual(sr, gt)
            total += l_percep + l_style
            logs["l_percep"] = l_percep
        if self.cri_gan is not None:
            fake_pred, _ = self.apply_d(state.params_d, state.stats_d, sr, True, True, "img")
            real_pred, _ = self.apply_d(state.params_d, state.stats_d, gt, True, True, "img")
            l_g_gan = self.gan_g_loss(fake_pred, jax.lax.stop_gradient(real_pred))
            total += l_g_gan
            logs["l_g_gan"] = l_g_gan
            if self.net_d_grad is not None:
                fake_g, _ = self.apply_d(state.params_d, state.stats_d, sr_grad, True, True, "grad")
                real_g, _ = self.apply_d(state.params_d, state.stats_d, gt_grad, True, True, "grad")
                l_g_gan_grad = self.gan_g_loss(fake_g, jax.lax.stop_gradient(real_g))
                total += l_g_gan_grad
                logs["l_g_gan_grad"] = l_g_gan_grad
        return total, logs, sr

    def make_train_step(self):
        if self.net_d is None or self.net_d_grad is None:
            return super().make_train_step()

        train_opt = self.opt.get("train") or {}
        branch_pretrain = bool(train_opt.get("Branch_pretrain", 0))
        branch_init_iters = int(train_opt.get("Branch_init_iters", 5000))
        net_d_iters = int(train_opt.get("net_d_iters", 1))
        net_d_init_iters = int(train_opt.get("net_d_init_iters", 0))

        def step_fn(state: TrainState, batch: dict):
            rng, sub = jax.random.split(state.rng)
            it = state.step + 1

            def g_loss_fn(params_g):
                total, logs, sr = self.g_losses_gan(params_g, state, batch, sub)
                return total, (logs, sr)

            (l_g_total, (logs, sr)), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(state.params_g)
            updates_g, opt_state_g_new = self.tx_g.update(grads_g, state.opt_state_g, state.params_g)
            params_g_new = jax.tree_util.tree_map(lambda p, u: p + u, state.params_g, updates_g)
            # net_d_iters / net_d_init_iters gating (spsrssl_model.py:387): on
            # skipped iterations the reference never steps optimizer_g —
            # select old (params, opt_state) wholesale, one compiled program.
            g_on = jnp.logical_and(it % net_d_iters == 0, it > net_d_init_iters)
            sel = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(g_on, n, o), new, old)
            params_g = sel(params_g_new, state.params_g)
            opt_state_g = sel(opt_state_g_new, state.opt_state_g)
            # Branch pretrain (reference spsrssl_model.py:284-291): during the
            # first Branch_init_iters only the fusion branch ('f_*') trains —
            # frozen params (and their Adam moments) keep their old values.
            if branch_pretrain:
                def keep_branch_only(path, new, old):
                    in_branch = any(str(getattr(p, "key", "")).startswith("f_")
                                    for p in path)
                    if in_branch:
                        return new
                    return jnp.where(it <= branch_init_iters, old, new)
                params_g = jax.tree_util.tree_map_with_path(
                    keep_branch_only, params_g, state.params_g)

            sr_sg = jax.lax.stop_gradient(sr)
            gt = batch["gt"]
            sr_grad_sg = jax.lax.stop_gradient(image_gradient(sr_sg))
            gt_grad = image_gradient(gt)

            def d_loss_fn(params_d):
                real_i, s1 = self.apply_d(params_d, state.stats_d, gt, True, True, "img")
                fake_i, s2 = self.apply_d(params_d, {**state.stats_d, "img": s1}, sr_sg, True, True, "img")
                l_i, d_logs = self.gan_d_loss(real_i, fake_i)
                real_g, s3 = self.apply_d(params_d, state.stats_d, gt_grad, True, True, "grad")
                fake_g, s4 = self.apply_d(params_d, {**state.stats_d, "grad": s3}, sr_grad_sg, True, True, "grad")
                l_g, g_logs = self.gan_d_loss(real_g, fake_g)
                d_logs = {**d_logs, "l_d_real_grad": g_logs["l_d_real"],
                          "l_d_fake_grad": g_logs["l_d_fake"]}
                stats = {"img": s2, "grad": s4}
                return l_i + l_g, (d_logs, stats)

            (l_d, (d_logs, stats_d)), grads_d = jax.value_and_grad(d_loss_fn, has_aux=True)(state.params_d)
            updates_d, opt_state_d = self.tx_d.update(grads_d, state.opt_state_d, state.params_d)
            params_d = jax.tree_util.tree_map(lambda p, u: p + u, state.params_d, updates_d)

            ema = state.ema_params_g
            if self.ema_decay > 0:
                ema = ema_update(ema, params_g, self.ema_decay)
            logs.update(d_logs)
            logs["l_g_total"] = l_g_total
            logs["lr"] = self.schedule_g(state.step)
            return state.replace(step=it, rng=rng, params_g=params_g, opt_state_g=opt_state_g,
                                 ema_params_g=ema, params_d=params_d, stats_d=stats_d,
                                 opt_state_d=opt_state_d), logs
        return step_fn

    # inference: SPSRNet returns a tuple; take the fused SR output
    def _apply_g(self, params, lq):
        if self._g_apply is None:
            self._g_apply = jax.jit(lambda p, x: self.net_g.apply({"params": p}, x)[1])
        lq = self._match_param_devices(params, lq)
        return self._g_apply(params, lq)
