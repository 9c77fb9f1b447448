"""StyleGAN2 training recipe (reference: the diffusion tree's vendored
basicsr/models/stylegan2_model.py:18-283).

TPU-native redesign:
- The reference's lazy regularization (r1 every ``net_d_reg_every`` iters,
  path-length every ``net_g_reg_every``) runs as ``lax.cond`` branches inside
  the ONE jitted train step — the expensive double-backward executes only on
  regularization steps, with no recompile and no host sync.
- Style mixing (``mixing_noise``, :179-183) keeps static shapes: two latents
  are always sampled and the second is selected per-step with a traced
  Bernoulli — a repeated latent is mathematically the single-style path.
- ``mean_path_length`` (:82, running stat mutated across steps) lives in
  ``TrainState.extra``.
- The g/d reg-ratio lr+beta adjustments (:91,135) are applied at optimizer
  construction exactly as the reference computes them.
"""

from __future__ import annotations

from copy import deepcopy

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssl_tpu.archs import build_network
from ssl_tpu.losses import build_loss
from ssl_tpu.models.base_model import BaseModel, TrainState, ema_update
from ssl_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class StyleGAN2Model(BaseModel):

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.net_g = build_network(deepcopy(opt["network_g"]))
        self.num_style_feat = opt["network_g"].get("num_style_feat", 512)
        self.out_size = opt["network_g"]["out_size"]
        train_opt = opt.get("train") or {}
        self.train_opt = train_opt
        # EMA decay hardcoded in the reference optimize_parameters (:254)
        self.ema_decay = 0.5 ** (32 / (10 * 1000))
        self.best_metric_results: dict = {}
        self._g_apply = None
        if self.is_train:
            self.net_d = build_network(deepcopy(opt["network_d"]))
            self.cri_gan = build_loss(train_opt["gan_opt"])
            self.r1_reg_weight = train_opt["r1_reg_weight"]
            self.path_reg_weight = train_opt["path_reg_weight"]
            self.net_g_reg_every = train_opt["net_g_reg_every"]
            self.net_d_reg_every = train_opt["net_d_reg_every"]
            self.mixing_prob = train_opt["mixing_prob"]
            self.path_batch_shrink = train_opt.get("path_batch_shrink", 2)
            g_ratio = self.net_g_reg_every / (self.net_g_reg_every + 1)
            d_ratio = self.net_d_reg_every / (self.net_d_reg_every + 1)
            self.tx_g = optax.adam(train_opt["optim_g"]["lr"] * g_ratio,
                                   b1=0.0 ** g_ratio, b2=0.99 ** g_ratio)
            self.tx_d = optax.adam(train_opt["optim_d"]["lr"] * d_ratio,
                                   b1=0.0 ** d_ratio, b2=0.99 ** d_ratio)
        else:
            self.net_d = None

    # -------------------------------------------------------------- state init
    def init_state(self, lq_shape=None, seed: int = 0) -> TrainState:
        nsf = self.num_style_feat
        z0 = jnp.zeros((1, nsf), jnp.float32)
        variables = jax.jit(lambda k: self.net_g.init(k, [z0]))(jax.random.PRNGKey(seed))
        params_g = variables["params"]
        from ssl_tpu.models.sr_model import SRModel
        params_g = SRModel.load_pretrain(self, params_g)
        ema = jax.tree_util.tree_map(jnp.copy, params_g)
        state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            rng=jax.random.PRNGKey(self.opt.get("manual_seed", 0) or 0),
            params_g=params_g,
            opt_state_g=self.tx_g.init(params_g) if self.is_train else None,
            ema_params_g=ema,
            extra={"mean_path_length": jnp.asarray(0.0, jnp.float32)})
        if self.net_d is not None:
            img_shape = (1, self.out_size, self.out_size, 3)
            params_d = jax.jit(self.net_d.init)(jax.random.PRNGKey(seed + 1),
                                                jnp.zeros(img_shape, jnp.float32))["params"]
            state = state.replace(params_d=params_d, opt_state_d=self.tx_d.init(params_d))
        return state

    # ----------------------------------------------------------------- helpers
    def _g_forward(self, params_g, styles, noise_key, return_latents=False,
                   input_is_latent=False):
        return self.net_g.apply({"params": params_g}, styles,
                                input_is_latent=input_is_latent,
                                randomize_noise=True,
                                return_latents=return_latents,
                                rngs={"noise": noise_key})

    def _mixed_styles(self, k_noise, k_mix, batch: int):
        """Two latents, the second degenerate (== first) with prob 1-mixing
        (reference mixing_noise :179-183; identical-latent two-style == the
        single-style path since both repeat to the same broadcast)."""
        z = jax.random.normal(k_noise, (2, batch, self.num_style_feat))
        use_mix = jax.random.uniform(k_mix) < self.mixing_prob
        z2 = jnp.where(use_mix, z[1], z[0])
        return [z[0], z2]

    # -------------------------------------------------------------- train step
    def make_train_step(self):
        d_reg_every = self.net_d_reg_every
        g_reg_every = self.net_g_reg_every
        path_shrink = self.path_batch_shrink

        def step_fn(state: TrainState, batch: dict):
            real = batch["gt"]
            b = real.shape[0]
            it = state.step + 1
            rng, kd1, kd2, kdn, kg1, kg2, kgn, kp1, kpn, kpimg = \
                jax.random.split(state.rng, 10)
            logs = {}

            # ---------------- D phase (reference :188-221)
            styles_d = self._mixed_styles(kd1, kd2, b)
            fake_d, _ = self._g_forward(state.params_g, styles_d, kdn)
            fake_d = jax.lax.stop_gradient(fake_d)

            def d_loss_fn(params_d):
                real_pred = self.net_d.apply({"params": params_d}, real)
                fake_pred = self.net_d.apply({"params": params_d}, fake_d)
                l_d = self.cri_gan(real_pred, True, is_disc=True) + \
                    self.cri_gan(fake_pred, False, is_disc=True)

                def r1_branch(_):
                    # r1_penalty (gan_loss.py:143-156): grad of D(real) wrt real
                    g = jax.grad(lambda im: jnp.sum(
                        self.net_d.apply({"params": params_d}, im)))(real)
                    pen = jnp.mean(jnp.sum(g ** 2, axis=(1, 2, 3)))
                    return self.r1_reg_weight / 2 * pen * d_reg_every

                l_d_r1 = jax.lax.cond(it % d_reg_every == 0, r1_branch,
                                      lambda _: jnp.asarray(0.0), operand=None)
                aux = {"l_d": l_d, "l_d_r1": l_d_r1,
                       "real_score": jnp.mean(real_pred),
                       "fake_score": jnp.mean(fake_pred)}
                return l_d + l_d_r1, aux

            (l_d_total, d_logs), grads_d = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.params_d)
            updates_d, opt_state_d = self.tx_d.update(grads_d, state.opt_state_d,
                                                      state.params_d)
            params_d = jax.tree_util.tree_map(lambda p, u: p + u,
                                              state.params_d, updates_d)
            logs.update(d_logs)

            # ---------------- G phase (reference :223-249)
            styles_g = self._mixed_styles(kg1, kg2, b)
            path_bs = max(1, b // path_shrink)
            mean_path = state.extra["mean_path_length"]

            def g_loss_fn(params_g):
                fake_g, _ = self._g_forward(params_g, styles_g, kgn)
                fake_pred = self.net_d.apply({"params": params_d}, fake_g)
                l_g = self.cri_gan(fake_pred, True, is_disc=False)

                def path_branch(_):
                    # g_path_regularize (gan_loss.py:159-171); the latent is
                    # recovered with one return_latents pass, then the image
                    # jacobian-vector product is taken wrt that latent with
                    # the SAME noise key so f(latent) is the identical map
                    zp = jax.random.normal(kp1, (path_bs, self.num_style_feat))
                    _, latent = self._g_forward(params_g, [zp], kpn,
                                                return_latents=True)
                    h = w = self.out_size
                    noise_img = jax.random.normal(kpimg, (path_bs, h, w, 3)) / \
                        np.sqrt(h * w)

                    def inner(lat):
                        img, _ = self._g_forward(params_g, [lat], kpn,
                                                 input_is_latent=True)
                        return jnp.sum(img * noise_img)

                    grad_lat = jax.grad(inner)(latent)
                    path_lengths = jnp.sqrt(jnp.mean(
                        jnp.sum(grad_lat ** 2, axis=2), axis=1))
                    path_mean = mean_path + 0.01 * (jnp.mean(path_lengths) - mean_path)
                    penalty = jnp.mean(
                        (path_lengths - jax.lax.stop_gradient(path_mean)) ** 2)
                    l_path = self.path_reg_weight * g_reg_every * penalty
                    return l_path, jnp.mean(path_lengths), \
                        jax.lax.stop_gradient(path_mean)

                l_g_path, path_len, new_mean = jax.lax.cond(
                    it % g_reg_every == 0, path_branch,
                    lambda _: (jnp.asarray(0.0), jnp.asarray(0.0), mean_path),
                    operand=None)
                aux = {"l_g": l_g, "l_g_path": l_g_path, "path_length": path_len}
                return l_g + l_g_path, (aux, new_mean)

            (l_g_total, (g_logs, new_mean)), grads_g = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.params_g)
            updates_g, opt_state_g = self.tx_g.update(grads_g, state.opt_state_g,
                                                      state.params_g)
            params_g = jax.tree_util.tree_map(lambda p, u: p + u,
                                              state.params_g, updates_g)
            logs.update(g_logs)

            ema = ema_update(state.ema_params_g, params_g, self.ema_decay)
            new_state = state.replace(
                step=it, rng=rng, params_g=params_g, opt_state_g=opt_state_g,
                ema_params_g=ema, params_d=params_d, opt_state_d=opt_state_d,
                extra={"mean_path_length": new_mean})
            return new_state, logs

        return step_fn

    def train_step(self, state: TrainState, batch: dict):
        if self._train_step is None:
            self._train_step = jax.jit(self.make_train_step(), donate_argnums=(0,))
        return self._train_step(state, batch)

    # --------------------------------------------------------------- sampling
    def sample(self, state: TrainState, num_samples: int = 16, seed: int = 0,
               truncation: float = 1.0) -> np.ndarray:
        """EMA samples from fixed latents (reference test(): net_g_ema on
        self.fixed_sample, :256-259).  Returns (n, H, W, 3) in [-1, 1]."""
        z = jax.random.normal(jax.random.PRNGKey(seed),
                              (num_samples, self.num_style_feat))
        params = state.ema_params_g if state.ema_params_g is not None \
            else state.params_g
        img, _ = self.net_g.apply({"params": params}, [z],
                                  randomize_noise=False, truncation=truncation)
        return np.asarray(img)

    def validation(self, state: TrainState, dataloader, current_iter,
                   tb_logger=None, save_img=False):
        """Sample-grid validation (reference nondist_validation :265-278)."""
        num = (self.opt.get("val") or {}).get("num_val_samples", 16)
        imgs = self.sample(state, num_samples=num,
                           seed=self.opt.get("manual_seed", 0) or 0)
        if save_img:
            import os

            from ssl_tpu.utils.img_util import imwrite
            grid = ((np.clip(imgs, -1, 1) + 1) * 127.5).astype(np.uint8)
            grid = grid.reshape(-1, *grid.shape[2:])
            path = os.path.join(self.opt["path"]["visualization"], "train",
                                f"train_{current_iter}.png")
            imwrite(grid[..., ::-1], path)
        return {}
