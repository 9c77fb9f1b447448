"""CFW (Controllable Feature Wrapping) decoder training — StableSR stage 2.

Reference parity: the reference trains AutoencoderKLResi separately on
(GT, model-input, model-output) triplets dumped by gt_input_output
(Diffusion-Based-SR scripts/gt_input_output.py:1-335, configs/GT_input_output/)
with pixel + perceptual + adversarial losses (ldm autoencoder training,
autoencoder.py:469 consuming LPIPSWithDiscriminator); only the decoder-side
weights learn, the encoder stays the frozen SD VAE encoder.

TPU-native re-design: ONE jitted train step over a functional TrainState.
The frozen encoder/quant_conv params live in `state.extra` and are merged
into the apply-tree inside the loss, so gradients flow only to the decoder,
post_quant_conv, and the zero-initialized CFW fusion convs; the latent is the
dumped stage-1 sampler latent when the batch carries one (reference
get_input, autoencoder.py:650-665 — descaled by scale_factor), falling back
to the (stop-gradient) frozen-encoder mean of the stage-1 output image; the
fusion features come from encoding the (bicubically upscaled) model input.

CLI: ``python -m ssl_tpu.diffusion.cfw_train --base <cfg> --logdir <dir>``
— accepts the reference's configs/autoencoder/*_resi.yaml OmegaConf schema
drop-in, reads the gt_input_output dump root, supports
``parallel: {data: N}`` data-parallel meshes and key=value overrides.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ssl_tpu.archs import build_network
from ssl_tpu.diffusion.vae import AutoencoderKLResi
from ssl_tpu.losses import build_loss
from ssl_tpu.models.base_model import TrainState, build_optimizer, ema_update
from ssl_tpu.models.lr_scheduler import build_schedule

_FROZEN = ("encoder", "quant_conv")


def _split_params(params: dict):
    trainable = {k: v for k, v in params.items() if k not in _FROZEN}
    frozen = {k: v for k, v in params.items() if k in _FROZEN}
    return trainable, frozen


class CFWTrainModel:
    """Stage-2 CFW decoder trainer (gan-style G/D alternation)."""

    def __init__(self, opt: dict):
        self.opt = opt
        vae_cfg = opt.get("vae") or {}
        self.net = AutoencoderKLResi(**vae_cfg)
        train_opt = opt.get("train") or {}
        self.pixel_weight = float(train_opt.get("pixel_weight", 1.0))
        self.schedule_g = build_schedule(train_opt, train_opt.get("optim_g", {}).get("lr", 1e-4))
        self.tx_g = build_optimizer(train_opt.get("optim_g", {"type": "Adam", "lr": 1e-4}),
                                    self.schedule_g)
        self.cri_perceptual = (build_loss(train_opt["perceptual_opt"])
                               if train_opt.get("perceptual_opt") else None)
        self.net_d = (build_network(dict(opt["network_d"]))
                      if opt.get("network_d") else None)
        if self.net_d is not None:
            self.schedule_d = build_schedule(train_opt, train_opt.get("optim_d", {}).get("lr", 1e-4))
            self.tx_d = build_optimizer(train_opt.get("optim_d", {"type": "Adam", "lr": 1e-4}),
                                        self.schedule_d)
            self.cri_gan = build_loss(train_opt.get("gan_opt", {
                "type": "GANLoss", "gan_type": "vanilla", "loss_weight": 0.1}))
        self.ema_decay = float(train_opt.get("ema_decay", 0.999))
        # latent descale at get_input (reference autoencoder.py:661:
        # `latent / 0.18215`) when the batch carries the dumped stage-1 latent
        self.scale_factor = float(opt.get("scale_factor", 0.18215))
        self._train_step = None

    # ------------------------------------------------------------------ state
    def init_state(self, gt_shape=(1, 64, 64, 3), seed: int = 0) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        x = jnp.zeros(gt_shape, jnp.float32)
        variables = jax.jit(self.net.init)(rng, x)
        trainable, frozen = _split_params(variables["params"])
        # pretrained VAE: our pickle tree, or an SD/ldm .pth|.ckpt (CFW fuse
        # convs stay zero-init when absent from the checkpoint)
        path = (self.opt.get("path") or {}).get("pretrain_vae")
        if path and path.endswith((".pth", ".pt", ".ckpt")):
            from ssl_tpu.utils.weight_port import (convert_ldm_vae,
                                                   load_torch_state_dict,
                                                   merge_into_tree, _as_jnp)
            sd = load_torch_state_dict(path, "state_dict")
            merged = merge_into_tree(variables["params"], _as_jnp(convert_ldm_vae(sd)))
            trainable, frozen = _split_params(merged)
        elif path:
            from ssl_tpu.utils.weight_port import load_params_auto
            loaded = load_params_auto(path, "params", variables["params"])
            if loaded is None:
                raise ValueError(f"pretrain_vae={path}: conversion failed — "
                                 "CFW stage-2 needs real VAE weights.")
            trainable, frozen = _split_params(loaded)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), rng=rng,
            params_g=trainable, opt_state_g=self.tx_g.init(trainable),
            ema_params_g=jax.tree_util.tree_map(jnp.copy, trainable),
            extra={"frozen": frozen})
        if self.net_d is not None:
            var_d = jax.jit(self.net_d.init)(jax.random.PRNGKey(seed + 1), x)
            state = state.replace(params_d=var_d["params"],
                                  stats_d=var_d.get("batch_stats", {}),
                                  opt_state_d=self.tx_d.init(var_d["params"]))
        return state

    # ------------------------------------------------------------------ apply
    def _decode_cfw(self, trainable, frozen, sr_img, lq_img, latent=None):
        """Reference forward (autoencoder.py:590-593): decode the stage-1
        latent with LQ-encoder fusion features.  When the dumped latent is in
        the batch it is used directly (descaled by scale_factor, reference
        get_input :661); otherwise z falls back to the frozen-encoder mean of
        the stage-1 output image."""
        params = {**frozen, **trainable}

        def enc(x):
            return self.net.apply({"params": params}, x, method=AutoencoderKLResi.encode)

        if latent is None:
            z, _, _ = enc(sr_img)
        else:
            z = latent / self.scale_factor
        _, _, feas = enc(lq_img)
        z = jax.lax.stop_gradient(z)
        feas = [jax.lax.stop_gradient(f) for f in feas]
        return self.net.apply({"params": params}, z, feas,
                              method=AutoencoderKLResi.decode)

    def apply_d(self, params_d, stats_d, x, mutable=False):
        variables = {"params": params_d, "batch_stats": stats_d}
        if mutable:
            out, new_vars = self.net_d.apply(variables, x, True, mutable=["batch_stats"])
            return out, new_vars.get("batch_stats", stats_d)
        return self.net_d.apply(variables, x, True), stats_d

    # ------------------------------------------------------------- train step
    def make_train_step(self):
        if self._train_step is not None:
            return self._train_step

        def g_loss_fn(trainable, state: TrainState, batch: dict):
            dec = self._decode_cfw(trainable, state.extra["frozen"],
                                   batch["sr"], batch["lq"],
                                   latent=batch.get("latent"))
            logs = {}
            l_pix = self.pixel_weight * jnp.mean(jnp.abs(dec - batch["gt"]))
            total = l_pix
            logs["l_pix"] = l_pix
            if self.cri_perceptual is not None:
                l_percep, _ = self.cri_perceptual(dec, batch["gt"])
                if l_percep is not None:
                    total = total + l_percep
                    logs["l_percep"] = l_percep
            if self.net_d is not None:
                fake_pred, _ = self.apply_d(state.params_d, state.stats_d, dec, mutable=True)
                l_g_gan = self.cri_gan(fake_pred, True, is_disc=False)
                total = total + l_g_gan
                logs["l_g_gan"] = l_g_gan
            logs["l_total"] = total
            return total, (logs, dec)

        def step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
            (_, (logs, dec)), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.params_g, state, batch)
            updates, new_opt_g = self.tx_g.update(grads, state.opt_state_g, state.params_g)
            import optax
            new_params_g = optax.apply_updates(state.params_g, updates)
            new_ema = ema_update(state.ema_params_g, new_params_g, self.ema_decay)
            state = state.replace(params_g=new_params_g, opt_state_g=new_opt_g,
                                  ema_params_g=new_ema)
            if self.net_d is not None:
                dec_sg = jax.lax.stop_gradient(dec)

                def d_loss_fn(params_d):
                    real_pred, stats1 = self.apply_d(params_d, state.stats_d,
                                                     batch["gt"], mutable=True)
                    fake_pred, stats2 = self.apply_d(params_d, stats1, dec_sg, mutable=True)
                    l_d = (self.cri_gan(real_pred, True, is_disc=True)
                           + self.cri_gan(fake_pred, False, is_disc=True))
                    return l_d, stats2

                (l_d, new_stats), grads_d = jax.value_and_grad(d_loss_fn, has_aux=True)(
                    state.params_d)
                upd_d, new_opt_d = self.tx_d.update(grads_d, state.opt_state_d, state.params_d)
                import optax
                new_params_d = optax.apply_updates(state.params_d, upd_d)
                state = state.replace(params_d=new_params_d, opt_state_d=new_opt_d,
                                      stats_d=new_stats)
                logs["l_d"] = l_d
            state = state.replace(step=state.step + 1)
            return state, logs

        self._train_step = jax.jit(step, donate_argnums=(0,))
        return self._train_step

    # -------------------------------------------------------------- inference
    def decode(self, state: TrainState, sr_img, lq_img, use_ema: bool = True):
        trainable = state.ema_params_g if use_ema else state.params_g
        return self._decode_cfw(trainable, state.extra["frozen"], sr_img, lq_img)


def save_cfw_params(state: TrainState, path: str, use_ema: bool = True) -> None:
    """Export the full AutoencoderKLResi tree (trainable merged with the
    frozen encoder) as {'params': tree} for test_cli --vqgan_ckpt."""
    import pickle
    import numpy as np
    trainable = state.ema_params_g if use_ema else state.params_g
    full = {**state.extra["frozen"], **trainable}
    full = jax.tree_util.tree_map(np.asarray, full)
    with open(path, "wb") as f:
        pickle.dump({"params": full}, f)


class CFWTripletDataset:
    """Aligned (gt, inputs, samples[, latents]) folders as dumped by
    scripts/gt_input_output.py — the reference SingleImageNPDataset layout
    (Diffusion-Based-SR basicsr/data/single_image_dataset.py:76-121:
    ``<root>/{gts,inputs,latents,samples}``).  `inputs` are upscaled to gt
    resolution if smaller (bicubic).  With latents present, random crops are
    8-aligned so the /8-resolution latent crops stay pixel-aligned."""

    def __init__(self, gt_dir: str, input_dir: str, output_dir: str,
                 crop_size: int = 0, seed: int = 0, latent_dir: str | None = None):
        import os

        def listing(d, exts=(".png", ".jpg", ".jpeg", ".bmp")):
            return sorted(os.path.join(d, f) for f in os.listdir(d)
                          if f.lower().endswith(exts))

        self.gt_paths = listing(gt_dir)
        self.in_paths = listing(input_dir)
        self.out_paths = listing(output_dir)
        assert len(self.gt_paths) == len(self.in_paths) == len(self.out_paths), \
            "gt/inputs/outputs folders must have matching file counts"
        self.np_paths = None
        if latent_dir:
            self.np_paths = listing(latent_dir, exts=(".npy",))
            assert len(self.np_paths) == len(self.gt_paths), \
                "latents folder must match gt count"
        self.crop = crop_size
        self.rng = np.random.RandomState(seed)

    @classmethod
    def from_root(cls, root: str, crop_size: int = 0, seed: int = 0):
        """Reference layout: root/{gts,inputs,samples[,latents]}."""
        import os
        latent_dir = os.path.join(root, "latents")
        return cls(os.path.join(root, "gts"), os.path.join(root, "inputs"),
                   os.path.join(root, "samples"), crop_size=crop_size,
                   seed=seed,
                   latent_dir=latent_dir if os.path.isdir(latent_dir) else None)

    def __len__(self):
        return len(self.gt_paths)

    def _read(self, path):
        with open(path, "rb") as f:
            data = f.read()
        from ssl_tpu.utils.img_util import imfrombytes
        return imfrombytes(data, float32=True)

    def __getitem__(self, idx):
        gt = self._read(self.gt_paths[idx])
        lq = self._read(self.in_paths[idx])
        sr = self._read(self.out_paths[idx])
        latent = np.load(self.np_paths[idx]) if self.np_paths else None
        if lq.shape[:2] != gt.shape[:2]:
            from ssl_tpu.utils.matlab_resize import imresize
            lq = imresize(lq, gt.shape[0] / lq.shape[0])
        if self.crop:
            h, w = gt.shape[:2]
            top = self.rng.randint(0, max(1, h - self.crop + 1))
            left = self.rng.randint(0, max(1, w - self.crop + 1))
            if latent is not None:       # keep the /8 latent crop aligned
                top, left = top // 8 * 8, left // 8 * 8
                latent = latent[top // 8:(top + self.crop) // 8,
                                left // 8:(left + self.crop) // 8]
            sl = np.s_[top:top + self.crop, left:left + self.crop]
            gt, lq, sr = gt[sl], lq[sl], sr[sl]
        # [-1, 1] — the VAE's (and test_cli's) working range; the latent stays
        # in the sampler's scaled space (descaled inside _decode_cfw, matching
        # the reference's get_input `latent / 0.18215`)
        to_range = lambda a: a.astype(np.float32) * 2.0 - 1.0
        out = {"gt": to_range(gt), "lq": to_range(lq), "sr": to_range(sr)}
        if latent is not None:
            out["latent"] = latent.astype(np.float32)
        return out


def train(args):
    """CFW stage-2 training CLI (the reference trains AutoencoderKLResi via
    main.py with configs/autoencoder/autoencoder_kl_64x64x4_resi.yaml; that
    OmegaConf schema is drop-in here via ref_config).  Data is the
    gt_input_output dump root ({gts,inputs,samples[,latents]})."""
    import os
    import pickle
    import time

    import yaml

    from ssl_tpu.diffusion.ref_config import (is_reference_schema,
                                              translate_reference_config)

    with open(args.base) as f:
        cfg = yaml.safe_load(f)
    if is_reference_schema(cfg):
        cfg = translate_reference_config(cfg)
        assert cfg.get("kind") == "cfw", \
            "not a CFW/autoencoder config — train it with ssl_tpu.diffusion.main"
    if getattr(args, "overrides", None):
        from ssl_tpu.diffusion.main import apply_dotlist
        cfg = apply_dotlist(cfg, args.overrides)

    model = CFWTrainModel(cfg)
    data_cfg = cfg.get("data", {}) or {}
    tr = data_cfg.get("train", {}) or {}
    root = args.data_root or tr.get("gt_path") or tr.get("root")
    if isinstance(root, (list, tuple)):
        root = root[0]
    crop = int(data_cfg.get("crop_size", tr.get("crop_size", 0) or 0))
    ds = CFWTripletDataset.from_root(root, crop_size=crop)
    assert len(ds) > 0, f"no triplets under {root}"
    batch_size = int(data_cfg.get("batch_size", 1))

    # optional data-parallel mesh (`parallel: {data: N}`): replicated state,
    # batch sharded over 'data' — the Lightning-DDP analogue
    import jax
    import jax.numpy as jnp
    mesh = None
    par = cfg.get("parallel") or {}
    n_data = int(par.get("data", 0))
    batch_sh = None
    if n_data > 1:
        from ssl_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                           replicate_sharding)
        mesh = create_mesh(jax.devices()[:n_data])
        batch_sh = batch_sharding(mesh)
        assert batch_size % n_data == 0, \
            f"batch_size {batch_size} must divide over data={n_data}"

    probe = ds[0]
    gt_hw = probe["gt"].shape[:2]
    state = model.init_state(gt_shape=(batch_size,) + gt_hw + (3,))
    if getattr(args, "resume", None):
        with open(args.resume, "rb") as f:
            restored = pickle.load(f)
        state = jax.tree_util.tree_map(lambda _, r: jnp.asarray(r),
                                       state, restored)
        print(f"resumed from {args.resume} at step {int(state.step)}", flush=True)
    if mesh is not None:
        state = jax.device_put(state, replicate_sharding(mesh))

    total_steps = int(cfg.get("train", {}).get("max_steps", 100000))
    log_every = int(cfg.get("train", {}).get("log_every", 100))
    save_every = int(cfg.get("train", {}).get("save_every", 1500))
    os.makedirs(args.logdir, exist_ok=True)

    rng = np.random.RandomState(0)
    step = int(state.step)
    t0 = time.time()
    while step < total_steps:
        idx = rng.randint(0, len(ds), size=batch_size)
        items = [ds[int(i)] for i in idx]
        batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
        if batch_sh is not None:
            batch = {k: jax.device_put(jnp.asarray(v), batch_sh)
                     for k, v in batch.items()}
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, logs = model.make_train_step()(state, batch)
        step += 1
        if step % log_every == 0:
            host = {k: float(v) for k, v in logs.items()}
            print(f"step {step} ({(time.time()-t0)/log_every:.2f}s/it): {host}",
                  flush=True)
            t0 = time.time()
        if step % save_every == 0 or step >= total_steps:
            save_cfw_params(state, os.path.join(args.logdir, f"cfw_{step}.pkl"))
            with open(os.path.join(args.logdir,
                                   f"cfw_state_{step}.pkl"), "wb") as f:
                pickle.dump(jax.device_get(state), f)
    return state


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--base", required=True,
                        help="CFW config (native or the reference's "
                             "configs/autoencoder/*_resi.yaml)")
    parser.add_argument("--logdir", default="logs/cfw")
    parser.add_argument("--data_root", default=None,
                        help="override the config's triplet dump root")
    parser.add_argument("--resume", default=None, help="cfw_state_*.pkl")
    args, unknown = parser.parse_known_args()
    args.overrides = unknown
    return train(args)


if __name__ == "__main__":
    main()
