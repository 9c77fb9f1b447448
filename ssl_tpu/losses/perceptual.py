"""Perceptual (VGG19 feature) loss with optional Gram-style term.

Reference parity: basicsr/losses/basic_loss.py:161-266 (layer-weight dict,
criterion l1/l2/fro, style_weight)."""

from __future__ import annotations

import jax.numpy as jnp

from ssl_tpu.archs.vgg_arch import init_vgg_variables
from ssl_tpu.utils.registry import LOSS_REGISTRY


def _gram(x):
    # NHWC -> gram over channels, normalized by (c*h*w)
    b, h, w, c = x.shape
    f = x.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (c * h * w)


@LOSS_REGISTRY.register()
class PerceptualLoss:
    """Callable perceptual loss. Holds frozen VGG variables (never trained)."""

    def __init__(self, layer_weights, vgg_type="vgg19", use_input_norm=True,
                 range_norm=False, perceptual_weight=1.0, style_weight=0.0,
                 criterion="l1", vgg_path=None, compute_dtype=None):
        assert vgg_type.startswith("vgg19"), "only vgg19 is wired up (reference default)"
        self.layer_weights = dict(layer_weights)
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion = criterion
        self.model, self.variables = init_vgg_variables(list(self.layer_weights), vgg_path=vgg_path)
        self._use_input_norm = use_input_norm
        self._range_norm = range_norm
        # re-instantiate with the right norm flags; compute_dtype='bfloat16'
        # runs the tower in bf16 activations (fp32 params/taps — see
        # VGGFeatureExtractor docstring), config key perceptual_opt.compute_dtype
        from ssl_tpu.archs.vgg_arch import VGGFeatureExtractor
        self.model = VGGFeatureExtractor(layer_name_list=tuple(self.layer_weights),
                                         use_input_norm=use_input_norm, range_norm=range_norm,
                                         compute_dtype=compute_dtype)

    def _dist(self, a, b):
        if self.criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        if self.criterion in ("l2", "mse"):
            return jnp.mean((a - b) ** 2)
        if self.criterion == "fro":
            return jnp.linalg.norm(a - b)
        raise NotImplementedError(f"{self.criterion} criterion has not been supported.")

    def __call__(self, x, gt):
        """x, gt: NHWC in [0,1]. Returns (percep_loss, style_loss) like the
        reference (either may be None-equivalent 0 when weight is 0)."""
        import jax
        fx = self.model.apply(self.variables, x)
        fgt = jax.lax.stop_gradient(self.model.apply(self.variables, gt))

        percep = 0.0
        style = 0.0
        for name, wgt in self.layer_weights.items():
            percep += self._dist(fx[name], fgt[name]) * wgt
            if self.style_weight > 0:
                style += self._dist(_gram(fx[name]), _gram(fgt[name])) * wgt
        percep = percep * self.perceptual_weight
        style = style * self.style_weight
        return percep, style
