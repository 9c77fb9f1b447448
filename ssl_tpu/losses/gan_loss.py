"""GAN losses: vanilla/lsgan/wgan/wgan_softplus/hinge (+ multiscale).

Reference parity: basicsr/losses/gan_loss.py:10-140. Relativistic composition
happens in the model recipes, as in the reference (esrganssl_model.py:238-246)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssl_tpu.utils.registry import LOSS_REGISTRY


@LOSS_REGISTRY.register()
class GANLoss:
    def __init__(self, gan_type="vanilla", real_label_val=1.0, fake_label_val=0.0, loss_weight=1.0):
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight
        if gan_type not in ("vanilla", "lsgan", "wgan", "wgan_softplus", "hinge"):
            raise NotImplementedError(f"GAN type {gan_type} is not implemented.")

    def _target(self, x, target_is_real):
        val = self.real_label_val if target_is_real else self.fake_label_val
        return jnp.full_like(x, val)

    def __call__(self, x, target_is_real: bool, is_disc: bool = False):
        if self.gan_type == "vanilla":
            # BCE-with-logits against constant labels
            t = self._target(x, target_is_real)
            loss = jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))
        elif self.gan_type == "lsgan":
            loss = jnp.mean((x - self._target(x, target_is_real)) ** 2)
        elif self.gan_type == "wgan":
            loss = -jnp.mean(x) if target_is_real else jnp.mean(x)
        elif self.gan_type == "wgan_softplus":
            loss = jnp.mean(jax.nn.softplus(-x)) if target_is_real else jnp.mean(jax.nn.softplus(x))
        elif self.gan_type == "hinge":
            if is_disc:
                x = -x if target_is_real else x
                loss = jnp.mean(jax.nn.relu(1 + x))
            else:
                loss = -jnp.mean(x)
        # hinge D-loss never multiplies by loss_weight (reference gan_loss.py:94-100)
        return loss if (is_disc and self.gan_type == "hinge") else loss * (1.0 if is_disc else self.loss_weight)


@LOSS_REGISTRY.register()
class MultiScaleGANLoss(GANLoss):
    """GAN loss over a list (scales) of predictions, averaging per-scale losses."""

    def __call__(self, x, target_is_real, is_disc=False):
        if isinstance(x, (list, tuple)):
            total = 0.0
            for pred in x:
                if isinstance(pred, (list, tuple)):
                    pred = pred[-1]
                total += super().__call__(pred, target_is_real, is_disc) / len(x)
            return total
        return super().__call__(x, target_is_real, is_disc)


@LOSS_REGISTRY.register()
class GANFeatLoss:
    """Feature-matching loss over a multiscale D's intermediate features
    (upstream BasicSR GANFeatLoss; consumed by HiFaceGANModel's
    ``feature_matching_opt`` — reference hifacegan_model.py:46-49,151-154).
    pred_fake/pred_real: list (num_d) of lists of per-layer features, last
    entry the logits."""

    def __init__(self, criterion="l1", loss_weight=1.0, reduction="mean"):
        if criterion not in ("l1", "l2", "charbonnier"):
            raise ValueError(f"Unsupported loss mode: {criterion}")
        self.criterion = criterion
        self.loss_weight = loss_weight

    def _elem(self, a, b):
        if self.criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        if self.criterion == "l2":
            return jnp.mean((a - b) ** 2)
        return jnp.mean(jnp.sqrt((a - b) ** 2 + 1e-12))

    def __call__(self, pred_fake, pred_real):
        num_d = len(pred_fake)
        loss = 0.0
        for i in range(num_d):
            for j in range(len(pred_fake[i]) - 1):  # intermediate feats only
                loss += self._elem(pred_fake[i][j],
                                   jax.lax.stop_gradient(pred_real[i][j])) / num_d
        return loss * self.loss_weight


def r1_penalty(real_logits_fn, real_img):
    """R1 gradient penalty (reference gan_loss.py:144-160) as a functional."""
    grads = jax.grad(lambda im: jnp.sum(real_logits_fn(im)))(real_img)
    return jnp.mean(jnp.sum(grads ** 2, axis=(1, 2, 3)))
