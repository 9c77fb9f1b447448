"""Model builders (reference surface: basicsr/models/__init__.py build_model)."""
from ssl_tpu.utils.registry import MODEL_REGISTRY

from ssl_tpu.models import sr_model as _sr  # noqa: F401
from ssl_tpu.models import srgan_model as _srgan  # noqa: F401
from ssl_tpu.models import esrganssl_model as _essl  # noqa: F401
from ssl_tpu.models import realesrganssl_model as _ressl  # noqa: F401
from ssl_tpu.models import ldlssl_model as _ldl  # noqa: F401
from ssl_tpu.models import bebyganssl_model as _beby  # noqa: F401
from ssl_tpu.models import ranksrganssl_model as _rank  # noqa: F401
from ssl_tpu.models import spsrssl_model as _spsr  # noqa: F401
from ssl_tpu.models import window_ssl_models as _win  # noqa: F401
from ssl_tpu.models import bsrganssl_model as _bsr  # noqa: F401
from ssl_tpu.models import video_models as _video  # noqa: F401
from ssl_tpu.models import stylegan2_model as _sg2  # noqa: F401
from ssl_tpu.models import hifacegan_model as _hiface  # noqa: F401
from ssl_tpu.models.base_model import BaseModel, TrainState  # noqa: F401
from ssl_tpu.models.sr_model import SRModel  # noqa: F401
from ssl_tpu.models.srgan_model import ESRGANModel, SRGANModel  # noqa: F401
from ssl_tpu.models.esrganssl_model import ESRGANSSLModel  # noqa: F401


def build_model(opt: dict):
    return MODEL_REGISTRY.get(opt["model_type"])(opt)
