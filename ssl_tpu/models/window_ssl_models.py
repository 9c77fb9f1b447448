"""ELAN-GAN-SSL and SwinIR-GAN-SSL recipes.

Reference parity: models/elanganssl_model.py:30-597 and
swinirganssl_model.py:18-552.  Both are the ESRGAN-SSL recipe with a
window-attention generator; the reference's mod-pad ``pre_process``
(elanganssl_model.py:392-415, swinirganssl_model.py:360-382) lives INSIDE our
arch __call__ (reflect pad to the window LCM, crop after), so the recipes are
thin subclasses."""

from __future__ import annotations

from ssl_tpu.models.esrganssl_model import ESRGANSSLModel
from ssl_tpu.models.sr_model import SRModel
from ssl_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class ELANGANSSLModel(ESRGANSSLModel):
    """ELAN generator + relativistic GAN + SSL."""


@MODEL_REGISTRY.register()
class SwinIRGANSSLModel(ESRGANSSLModel):
    """SwinIR generator + relativistic GAN + SSL."""


@MODEL_REGISTRY.register()
class SwinIRModel(SRModel):
    """Non-GAN SwinIR recipe (reference swinir_model.py)."""


@MODEL_REGISTRY.register()
class ELANModel(SRModel):
    """Non-GAN ELAN recipe."""
