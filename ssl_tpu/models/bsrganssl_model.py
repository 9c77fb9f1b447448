"""BSRGAN-SSL — the KAIR-tree recipe (reference: train_BSGRAN/models/model_ssl.py:33-550).

Same SSL training core as ESRGAN-SSL but: lsgan/ragan gan types via config,
E_decay EMA, and mask_stride genuinely applied (the KAIR tree reads
train.mask_stride — model_ssl.py:293-294 — unlike the GAN tree where the
shipped configs leave it off; ssl_setting_from_opt handles both).  Data side:
DatasetBlindSRMask + BSRGAN shuffled degradation."""

from __future__ import annotations

from ssl_tpu.models.esrganssl_model import ESRGANSSLModel
from ssl_tpu.models.sr_model import SRModel
from ssl_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class BSRGANSSLModel(ESRGANSSLModel):
    """KAIR ModelSSL equivalent. gan_opt.gan_type 'lsgan' reproduces the
    shipped BSRGANSSL configs (train_BSRGANSSL_DF2K_OST_x4.json:89)."""


@MODEL_REGISTRY.register()
class BSGRANTestModel(SRModel):
    """Inference-only evaluation of KAIR-trained checkpoints inside this
    framework (reference bsrgantest_model.py:21)."""

    def __init__(self, opt: dict):
        opt = dict(opt)
        opt["is_train"] = False
        super().__init__(opt)


@MODEL_REGISTRY.register()
class BSGRANTestSwinIRModel(BSGRANTestModel):
    """SwinIR flavor of the KAIR test model (reference bsrgantest_swinir_model.py:22)."""
