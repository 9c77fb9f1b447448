"""Loss builders (reference surface: basicsr/losses/__init__.py build_loss)."""
from copy import deepcopy

from ssl_tpu.utils.registry import LOSS_REGISTRY

# populate registry
from ssl_tpu.losses import basic_loss as _basic  # noqa: F401
from ssl_tpu.losses import gan_loss as _gan  # noqa: F401
from ssl_tpu.losses import perceptual as _perc  # noqa: F401
from ssl_tpu.losses import feature_sim as _fsim  # noqa: F401
from ssl_tpu.losses.basic_loss import (  # noqa: F401
    CharbonnierLoss, CrossEntropyLoss, KLDistanceLoss, L1Loss, MSELoss, WeightedTVLoss,
)
from ssl_tpu.losses.gan_loss import GANFeatLoss, GANLoss, MultiScaleGANLoss  # noqa: F401
from ssl_tpu.losses.perceptual import PerceptualLoss  # noqa: F401
from ssl_tpu.losses.ssl_loss import SSLSetting, ssl_loss, ssl_setting_from_opt  # noqa: F401
from ssl_tpu.losses.loss_util import get_refined_artifact_map  # noqa: F401


def build_loss(opt: dict):
    """Instantiate a loss from an option dict with a `type` key."""
    opt = deepcopy(opt)
    loss_type = opt.pop("type")
    return LOSS_REGISTRY.get(loss_type)(**opt)
