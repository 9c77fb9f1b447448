"""HiFaceGAN training recipe (reference: the diffusion tree's vendored
basicsr/models/hifacegan_model.py:15-288).

The discriminator is conditional and multiscale: it sees ``concat([lq', x])``
on channels (lq' resized to the output size when shapes differ), and the fake
and real conditioned pairs are fed in ONE stacked batch so normalization
statistics are shared (reference discriminate(), :74-95) — which is also the
TPU-friendly dispatch.  Optional feature-matching loss over the D's
intermediate features (:151-154).  No EMA (:24-26)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssl_tpu.losses import build_loss
from ssl_tpu.models.base_model import TrainState
from ssl_tpu.models.srgan_model import SRGANModel
from ssl_tpu.utils.registry import MODEL_REGISTRY


def _tree_halves(pred):
    """_divide_pred (reference :97-114): split each tensor of the multiscale
    feature pyramid into (fake, real) batch halves."""
    if isinstance(pred, (list, tuple)):
        fakes, reals = [], []
        for p in pred:
            f, r = _tree_halves(p)
            fakes.append(f)
            reals.append(r)
        return fakes, reals
    n = pred.shape[0] // 2
    return pred[:n], pred[n:]


@MODEL_REGISTRY.register()
class HiFaceGANModel(SRGANModel):

    def __init__(self, opt: dict):
        if (opt.get("train") or {}).get("ema_decay", 0) > 0:
            raise NotImplementedError("HiFaceGAN does not support EMA now. Pass")
        super().__init__(opt)
        train_opt = opt.get("train") or {}
        self.cri_feat = build_loss(train_opt["feature_matching_opt"]) \
            if self.is_train and train_opt.get("feature_matching_opt") else None

    def d_init_shape(self, lq_shape):
        b, h, w, c = lq_shape
        s = self.scale
        return (2 * b, h * s, w * s, 2 * c)  # stacked fake+real, concat cond

    def _resize_to(self, x, hw):
        if x.shape[1:3] == hw:
            return x
        # torch F.interpolate default: nearest (reference :84-85)
        return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[3]),
                                method="nearest")

    def discriminate(self, params_d, stats_d, lq, output, gt):
        """One stacked conditional D call (reference :74-95)."""
        hw = output.shape[1:3]
        lq_r = self._resize_to(lq, hw)
        gt_r = self._resize_to(gt, hw)
        fake_concat = jnp.concatenate([lq_r, output], axis=-1)
        real_concat = jnp.concatenate([lq_r, gt_r], axis=-1)
        both = jnp.concatenate([fake_concat, real_concat], axis=0)
        pred, new_stats = self.apply_d(params_d, stats_d, both,
                                       train=True, mutable=True)
        pred_fake, pred_real = _tree_halves(pred)
        return pred_fake, pred_real, new_stats

    # ---------------------------------------------------------------- G phase
    def g_losses_gan(self, params_g, state: TrainState, batch: dict, rng):
        total, logs, sr = self.g_losses(params_g, state, batch, rng)
        if self.cri_gan is not None:
            pred_fake, pred_real, _ = self.discriminate(
                state.params_d, state.stats_d, batch["lq"], sr, batch["gt"])
            l_g_gan = self.cri_gan(pred_fake, True, is_disc=False)
            total += l_g_gan
            logs["l_g_gan"] = l_g_gan
            if self.cri_feat is not None:
                l_g_feat = self.cri_feat(pred_fake, pred_real)
                total += l_g_feat
                logs["l_g_feat"] = l_g_feat
        return total, logs, sr

    # ---------------------------------------------------------------- D phase
    def d_losses(self, params_d, state: TrainState, batch: dict, sr_sg):
        pred_fake, pred_real, stats2 = self.discriminate(
            params_d, state.stats_d, batch["lq"], sr_sg, batch["gt"])
        l_d_real = self.cri_gan(pred_real, True, is_disc=True)
        l_d_fake = self.cri_gan(pred_fake, False, is_disc=True)
        loss = (l_d_real + l_d_fake) / 2  # reference :185
        return loss, {"l_d_real": l_d_real, "l_d_fake": l_d_fake}, stats2

    # -------------------------------------------------------------- inference
    def test(self, state: TrainState, lq):
        # HiFaceGAN/SPADE run in train mode even for validation (reference
        # :194-214) — our flax modules are mode-free, so the base test() is
        # already the right semantics (stats are only updated when mutable).
        return super().test(state, lq)
