"""StableSR-SSL latent-diffusion fine-tuning — functional TPU recipe.

Reference parity: ldm/models/diffusion/ddpmssl.py:38-513
(LatentDiffusionSRTextWTSSL): eps/v-parameterized diffusion loss on latents +
pixel-space L1 (x0.1) on the differentiably-decoded x0 + SSL (0.5 L1 + 0.5 KL)
on decoded x0 vs GT with the edge mask, plus the queue and mask_stride from
the ``sslopt`` block (:445-446: stride genuinely ON in this tree).

TPU redesign notes:
- The whole train step (VAE encode, q_sample, UNet, decode, SSL) is ONE
  jitted function; the VAE decode stays in the grad graph exactly like the
  reference's differentiable_decode_first_stage (:417-420), wrapped in
  jax.checkpoint to bound memory (SURVEY §7.3 'Diffusion memory').
- Gradient accumulation (Lightning accumulate_grad_batches: 12,
  configs/SSL/base.yaml:190) maps to optax.MultiSteps.
- The text context for SR is the empty prompt.  With ``clip_text_ckpt`` (+
  CLIP_BPE_PATH) it is the converted CLIP text tower's empty-prompt
  penultimate hidden states, matching FrozenOpenCLIPEmbedder; without weights
  (zero-egress image) it falls back to a learned null-context vector.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ssl_tpu.diffusion.schedules import (
    DiffusionSchedule, build_schedule_arrays, make_beta_schedule,
    predict_start_from_noise, predict_start_from_v, get_v, q_sample,
)
from ssl_tpu.diffusion.unet import EncoderUNetModelWT, UNetModelDualcondV2
from ssl_tpu.diffusion.vae import AutoencoderKL
from ssl_tpu.losses.ssl_loss import SSLSetting, ssl_loss
from ssl_tpu.ops.ssg import SSGConfig


class DiffusionSSLConfig(NamedTuple):
    timesteps: int = 1000
    beta_schedule: str = "linear"
    linear_start: float = 0.00085
    linear_end: float = 0.012
    parameterization: str = "eps"        # 'eps' | 'x0' | 'v'
    scale_factor: float = 0.18215        # latent scaling (SD convention)
    pixel_weight: float = 0.1            # p_losses pixel L1 on decoded x0
    ssl_l1_weight: float = 0.5
    ssl_kl_weight: float = 0.5
    context_dim: int = 1024
    context_len: int = 77
    learn_logvar: bool = False


class DiffusionTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    rng: jnp.ndarray
    params: Any                      # {'unet', 'structcond', 'null_context'}
    frozen: Any                      # {'vae'} — first stage is frozen
    opt_state: Any
    ema_params: Any = None           # LitEma equivalent (ddpm.py use_ema)


class StableSRSSL:
    """Builder/holder for the diffusion-SSL training step."""

    def __init__(self, cfg: DiffusionSSLConfig = DiffusionSSLConfig(),
                 unet: UNetModelDualcondV2 | None = None,
                 structcond: EncoderUNetModelWT | None = None,
                 vae: AutoencoderKL | None = None,
                 ssl_setting: SSLSetting | None = None,
                 lr: float = 5e-5, accumulate: int = 1,
                 vae_ckpt: str | None = None,
                 clip_text_ckpt: str | None = None,
                 unet_ckpt: str | None = None,
                 text_prompt: str | None = None,
                 use_ema: bool = True, ema_decay: float = 0.9999,
                 mesh=None, zero: bool = False, zero_min_size: int = 2 ** 14):
        self.cfg = cfg
        # ZeRO-1 option: shard optimizer moments + EMA of the leaves the
        # tensor rules left replicated over the 'model' axis (memory only;
        # values unchanged)
        self.zero = zero
        self.zero_min_size = zero_min_size
        # optional 2-D (data, model) jax.sharding.Mesh: batch shards over
        # 'data', the UNet/structcond weights get Megatron-style tensor
        # sharding over 'model' (parallel/tensor.py) — XLA SPMD inserts the
        # all-reduces.  None = single-device (the reference's per-GPU step).
        self.mesh = mesh
        self.unet = unet or UNetModelDualcondV2(context_dim=cfg.context_dim)
        # StableSR's struct encoder has its OWN config (256ch, mult 1,1,2,2 —
        # configs/SSL/base.yaml:92-107), independent of the UNet's
        self.structcond = structcond or EncoderUNetModelWT()
        self.vae = vae or AutoencoderKL()
        self.ssl_setting = ssl_setting or SSLSetting(
            ssg=SSGConfig(), mask_stride=3, capacity=2048,
            l1_weight=cfg.ssl_l1_weight, kl_weight=cfg.ssl_kl_weight)
        self.sched: DiffusionSchedule = build_schedule_arrays(
            make_beta_schedule(cfg.beta_schedule, cfg.timesteps,
                               cfg.linear_start, cfg.linear_end))
        tx = optax.adamw(lr)
        self.tx = optax.MultiSteps(tx, accumulate) if accumulate > 1 else tx
        self.vae_ckpt = vae_ckpt
        self.clip_text_ckpt = clip_text_ckpt
        self.unet_ckpt = unet_ckpt
        # fixed train-time conditioning text (reference get_learned_
        # conditioning; SSL configs use '' but any prompt flows through)
        self.text_prompt = text_prompt
        # LitEma equivalent (reference ddpm.py use_ema=True, decay 0.9999)
        self.use_ema = use_ema
        self.ema_decay = ema_decay
        self._train_step = None

    def _text_encoder(self):
        """Frozen CLIP text tower from ``clip_text_ckpt`` — accepts OpenCLIP
        ViT-H layouts (bare open_clip_pytorch_model.bin or a full SD2.x/
        StableSR ckpt under cond_stage_model.model.*, the reference's actual
        FrozenOpenCLIPEmbedder source) as well as OpenAI-CLIP RN50 files.
        Cached after first build."""
        if getattr(self, "_text_enc_cache", None) is not None:
            return self._text_enc_cache
        from ssl_tpu.archs.clip_arch import CLIPTextEncoder
        from ssl_tpu.utils.weight_port import convert_openclip_text, load_torch_state_dict
        sd = load_torch_state_dict(self.clip_text_ckpt, "state_dict")
        text_p, meta = convert_openclip_text(sd)
        enc = CLIPTextEncoder(width=meta["width"], layers=meta["layers"],
                              heads=meta["heads"], embed_dim=meta["embed_dim"],
                              vocab_size=meta["vocab_size"],
                              context_length=self.cfg.context_len,
                              act=meta["act"])
        self._text_enc_cache = (enc, jax.tree_util.tree_map(jnp.asarray, text_p))
        return self._text_enc_cache

    def encode_text(self, prompts):
        """(b, context_len, width) penultimate-layer hidden states for a list
        of prompts — the reference's get_learned_conditioning through
        FrozenOpenCLIPEmbedder(layer='penultimate') (modules.py:181-198:
        token_embedding + pos, resblocks up to len-1, ln_final).  Tokenizer:
        exact-id parity with (open_)clip.tokenize (utils/clip_tokenizer)."""
        from ssl_tpu.utils.clip_tokenizer import SimpleTokenizer
        enc, text_p = self._text_encoder()
        toks = SimpleTokenizer().tokenize(list(prompts),
                                          context_length=self.cfg.context_len)
        return enc.apply({"params": text_p}, jnp.asarray(toks),
                         method=enc.hidden_states)

    def _clip_null_context(self):
        """Fixed-conditioning context: ``text_prompt`` (default '' — the
        reference's SSL configs always sample with the empty prompt, but a
        nonempty prompt flows through the same path)."""
        return self.encode_text([self.text_prompt or ""])[0]

    # ------------------------------------------------------------------- init
    def init_state(self, gt_shape=(1, 64, 64, 3), seed: int = 0) -> DiffusionTrainState:
        rng = jax.random.PRNGKey(seed)
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        gt = jnp.zeros(gt_shape, jnp.float32)
        vae_vars = jax.jit(self.vae.init)(r1, gt)
        if self.vae_ckpt:
            # frozen first stage from an SD/ldm checkpoint (the reference loads
            # SD 2.1 via ckpt_path, configs/StableSRISSLStage1)
            from ssl_tpu.utils.weight_port import (convert_ldm_vae, _as_jnp,
                                                   load_torch_state_dict,
                                                   merge_into_tree)
            sd = load_torch_state_dict(self.vae_ckpt, "state_dict")
            vae_vars = {"params": merge_into_tree(
                vae_vars["params"], _as_jnp(convert_ldm_vae(sd)))}
        z_shape = (gt_shape[0], gt_shape[1] // 8, gt_shape[2] // 8, self.vae.embed_dim)
        z = jnp.zeros(z_shape, jnp.float32)
        t = jnp.zeros((gt_shape[0],), jnp.int32)
        ctx = jnp.zeros((gt_shape[0], self.cfg.context_len, self.cfg.context_dim))
        sc_vars = jax.jit(self.structcond.init)(r2, z, t)
        feats = jax.eval_shape(lambda v, z_, t_: self.structcond.apply(v, z_, t_),
                               sc_vars, z, t)
        # dict keyed by str(width) (reference EncoderUNetModelWT returns the
        # same dict; SPADE looks features up by resolution)
        feats0 = jax.tree_util.tree_map(lambda f: jnp.zeros(f.shape, f.dtype), feats)
        unet_vars = jax.jit(self.unet.init)(r3, z, t, ctx, feats0)
        if self.unet_ckpt:
            # StableSR/SD UNet (+ struct encoder if present) import — lossless
            # key-map verified by the reference-module parity test
            from ssl_tpu.utils.weight_port import (_as_jnp, convert_sd_structcond,
                                                   convert_sd_unet,
                                                   load_torch_state_dict,
                                                   merge_into_tree)
            sd = load_torch_state_dict(self.unet_ckpt, "state_dict")
            unet_tree = convert_sd_unet(sd)
            if not unet_tree:
                raise ValueError(f"unet_ckpt={self.unet_ckpt}: no UNet keys found")
            unet_vars = {"params": merge_into_tree(unet_vars["params"],
                                                   _as_jnp(unet_tree))}
            sc_tree = convert_sd_structcond(sd)
            if sc_tree and any(k.startswith("structcond_stage_model.") for k in sd):
                sc_vars = {"params": merge_into_tree(sc_vars["params"],
                                                     _as_jnp(sc_tree))}
        if self.clip_text_ckpt:
            null_ctx = self._clip_null_context()
            assert null_ctx.shape[-1] == self.cfg.context_dim, \
                f"CLIP text width {null_ctx.shape[-1]} != context_dim {self.cfg.context_dim}"
        else:
            null_ctx = jax.random.normal(r4, (self.cfg.context_len,
                                              self.cfg.context_dim)) * 0.02
        params = {
            "unet": unet_vars["params"],
            "structcond": sc_vars["params"],
            "null_context": null_ctx,
        }
        ema = (jax.tree_util.tree_map(jnp.copy, params) if self.use_ema else None)
        return DiffusionTrainState(step=jnp.asarray(0, jnp.int32), rng=rng,
                                   params=params, frozen={"vae": vae_vars["params"]},
                                   opt_state=self.tx.init(params), ema_params=ema)

    def place_state(self, state: DiffusionTrainState) -> DiffusionTrainState:
        """Pin the train state to the mesh: tensor-parallel shardings on the
        UNet/structcond params (+ their EMA and optimizer moments, matched by
        path name), everything else replicated.  No-op without a mesh."""
        if self.mesh is None or self.mesh.size == 1:
            return state
        from ssl_tpu.parallel.tensor import state_tp_shardings
        return jax.device_put(
            state, state_tp_shardings(state, self.mesh, zero=self.zero,
                                      zero_min_size=self.zero_min_size))

    def shard_batch(self, batch: dict) -> dict:
        """Batch leaves sharded over the 'data' axis (no-op without a mesh)."""
        if self.mesh is None or self.mesh.size == 1:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from ssl_tpu.parallel.tensor import shard_batch_dp
        return shard_batch_dp(batch, self.mesh)

    def infer_params(self, state: DiffusionTrainState):
        """Sampling-time params: EMA weights when tracked (the reference
        samples under LitEma's ema_scope)."""
        return state.ema_params if state.ema_params is not None else state.params

    # ---------------------------------------------------------------- helpers
    def encode(self, vae_params, img, rng):
        """[-1,1] image -> scaled latent sample."""
        mean, logvar = self.vae.apply({"params": vae_params}, img, method=self.vae.encode)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return z * self.cfg.scale_factor

    def decode(self, vae_params, z):
        return self.vae.apply({"params": vae_params}, z / self.cfg.scale_factor,
                              method=self.vae.decode)

    def apply_model(self, params, z_noisy, t, context, z_lq):
        feats = self.structcond.apply({"params": params["structcond"]}, z_lq, t)
        return self.unet.apply({"params": params["unet"]}, z_noisy, t, context, feats)

    # ------------------------------------------------------------- train step
    def make_train_step(self):
        cfg = self.cfg
        sched = self.sched

        def step_fn(state: DiffusionTrainState, batch: dict):
            """batch: gt/lq in [0,1] NHWC (+ gt_mask).  Images are mapped to
            [-1,1] as in the reference get_input (ddpmssl.py:240-251)."""
            rng, r_t, r_noise, r_enc1 = jax.random.split(state.rng, 4)
            gt = batch["gt"] * 2.0 - 1.0
            lq = batch["lq"] * 2.0 - 1.0  # already upsampled to GT size by the pipeline
            b = gt.shape[0]
            vae_params = state.frozen["vae"]

            def loss_fn(params):
                # ONE frozen-encoder pass over [gt; lq] stacked on batch
                # (exact math — the encoder is per-image; GroupNorm stats are
                # per-sample) instead of two b-sized calls: at the reference's
                # tiny per-device batch (b2, configs/SSL/base.yaml) the
                # stacked call keeps the MXU busier per conv
                z_both = jax.lax.stop_gradient(self.encode(
                    vae_params, jnp.concatenate([gt, lq], axis=0), r_enc1))
                z0, z_lq = jnp.split(z_both, 2, axis=0)
                t = jax.random.randint(r_t, (b,), 0, sched.num_timesteps)
                noise = jax.random.normal(r_noise, z0.shape)
                z_noisy = q_sample(sched, z0, t, noise)
                context = jnp.broadcast_to(params["null_context"],
                                           (b,) + params["null_context"].shape)
                model_out = self.apply_model(params, z_noisy, t, context, z_lq)

                if cfg.parameterization == "eps":
                    target = noise
                    x0_pred = predict_start_from_noise(sched, z_noisy, t, model_out)
                elif cfg.parameterization == "v":
                    target = get_v(sched, z0, noise, t)
                    x0_pred = predict_start_from_v(sched, z_noisy, t, model_out)
                else:
                    target = z0
                    x0_pred = model_out
                l_simple = jnp.mean((model_out - target) ** 2)

                # decoded-x0 losses (decode stays differentiable; remat bounds
                # memory).  Skipped entirely when nothing consumes the decoded
                # image (pixel_weight 0 and SSL off) — XLA cannot DCE the
                # decode through `0.0 * mean(...)` itself.
                use_ssl = "gt_mask" in batch and (self.ssl_setting.l1_weight > 0 or
                                                  self.ssl_setting.kl_weight > 0)
                logs = {"l_simple": l_simple}
                total = l_simple
                if cfg.pixel_weight > 0 or use_ssl:
                    if getattr(self.vae, "remat_decoder_blocks", False):
                        # per-block remat inside the decoder (vae.Decoder):
                        # backward stores only block boundaries and replays
                        # one block at a time — fits 512² training on one
                        # v5e where a whole-decoder checkpoint replay OOMs
                        img_pred = self.decode(vae_params, x0_pred)
                    else:
                        decode_ckpt = jax.checkpoint(
                            lambda z: self.decode(vae_params, z))
                        img_pred = decode_ckpt(x0_pred)
                    img01 = jnp.clip((img_pred + 1.0) / 2.0, 0.0, 1.0)
                    gt01 = batch["gt"]
                    l_pixel = cfg.pixel_weight * jnp.mean(jnp.abs(img01 - gt01))
                    logs["l_pixel"] = l_pixel
                    total = total + l_pixel
                    if use_ssl:
                        l_ss, l_kl = ssl_loss(img01, gt01, batch["gt_mask"], self.ssl_setting)
                        total += l_ss + l_kl
                        logs["l_selfsim"] = l_ss
                        logs["l_selfsim_kl"] = l_kl
                logs["l_total"] = total
                return total, logs

            (total, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema = state.ema_params
            if ema is not None:
                # LitEma decay schedule (ldm/modules/ema.py): decay ramps as
                # (1+n)/(10+n) capped at max_decay (reference default 0.9999)
                n = state.step.astype(jnp.float32)  # num_updates so far
                decay = jnp.minimum(self.ema_decay, (1.0 + n) / (10.0 + n))
                ema = jax.tree_util.tree_map(
                    lambda e, p: e * decay + p * (1.0 - decay), ema, params)
            return state.replace(step=state.step + 1, rng=rng, params=params,
                                 opt_state=opt_state, ema_params=ema), logs
        return step_fn

    def train_step(self, state, batch):
        if self._train_step is None:
            self._train_step = jax.jit(self.make_train_step(), donate_argnums=(0,))
        return self._train_step(state, batch)

    # ---------------------------------------------------------------- preview
    def make_preview(self):
        """Training-time image preview (the Lightning ImageLogger surface,
        reference main.py:300-404 log_img): inputs, GT, VAE reconstruction
        and the single-step decoded x0 prediction at t = T/2, all in [0,1].
        Deterministic (fixed key) so successive dumps are comparable."""
        cfg, sched = self.cfg, self.sched

        def preview_fn(state: DiffusionTrainState, batch: dict):
            r_noise, r_enc = jax.random.split(jax.random.PRNGKey(0))
            gt = batch["gt"] * 2.0 - 1.0
            lq = batch["lq"] * 2.0 - 1.0
            b = gt.shape[0]
            vae_params = state.frozen["vae"]
            params = self.infer_params(state)
            z0 = self.encode(vae_params, gt, r_enc)
            z_lq = self.encode(vae_params, lq, r_enc)
            t = jnp.full((b,), sched.num_timesteps // 2, jnp.int32)
            noise = jax.random.normal(r_noise, z0.shape)
            z_noisy = q_sample(sched, z0, t, noise)
            context = jnp.broadcast_to(params["null_context"],
                                       (b,) + params["null_context"].shape)
            model_out = self.apply_model(params, z_noisy, t, context, z_lq)
            if cfg.parameterization == "eps":
                x0_pred = predict_start_from_noise(sched, z_noisy, t, model_out)
            elif cfg.parameterization == "v":
                x0_pred = predict_start_from_v(sched, z_noisy, t, model_out)
            else:
                x0_pred = model_out
            to01 = lambda x: jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
            return {"inputs": batch["lq"], "gt": batch["gt"],
                    "reconstruction": to01(self.decode(vae_params, z0)),
                    "pred_x0": to01(self.decode(vae_params, x0_pred))}

        return preview_fn

    def preview(self, state, batch):
        if getattr(self, "_preview", None) is None:
            self._preview = jax.jit(self.make_preview())
        return self._preview(state, batch)
