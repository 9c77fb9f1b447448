"""Network builders (reference surface: basicsr/archs/__init__.py build_network)."""
from copy import deepcopy

from ssl_tpu.utils.registry import ARCH_REGISTRY

# populate registry
from ssl_tpu.archs import bsrgan_arch as _b  # noqa: F401
from ssl_tpu.archs import discriminator_arch as _d  # noqa: F401
from ssl_tpu.archs import elan_arch as _e  # noqa: F401
from ssl_tpu.archs import ranksrgan_arch as _rk  # noqa: F401
from ssl_tpu.archs import rrdbnet_arch as _r  # noqa: F401
from ssl_tpu.archs import spsr_arch as _sp  # noqa: F401
from ssl_tpu.archs import srresnet_arch as _s  # noqa: F401
from ssl_tpu.archs import srvgg_arch as _v  # noqa: F401
from ssl_tpu.archs import stylegan2_arch as _sg  # noqa: F401
from ssl_tpu.archs import classic_sr_archs as _cl  # noqa: F401
from ssl_tpu.archs import basicvsr_arch as _bv  # noqa: F401
from ssl_tpu.archs import edvr_arch as _ed  # noqa: F401
from ssl_tpu.archs import ridnet_arch as _rid  # noqa: F401
from ssl_tpu.archs import video_extra_archs as _vx  # noqa: F401
from ssl_tpu.archs import degradat_arch as _de  # noqa: F401
from ssl_tpu.archs import hifacegan_arch as _hf  # noqa: F401
from ssl_tpu.archs import swinir_arch as _sw  # noqa: F401
from ssl_tpu.archs import kair_extra_arch as _ke  # noqa: F401
from ssl_tpu.archs import vgg_arch as _vg  # noqa: F401
from ssl_tpu.archs import dfdnet_arch as _df  # noqa: F401
from ssl_tpu.archs.elan_arch import ELAN  # noqa: F401
from ssl_tpu.archs.spsr_arch import SPSRNet  # noqa: F401
from ssl_tpu.archs.swinir_arch import SwinIR  # noqa: F401
from ssl_tpu.archs.discriminator_arch import UNetDiscriminatorSN, VGGStyleDiscriminator  # noqa: F401
from ssl_tpu.archs.rrdbnet_arch import RRDBNet  # noqa: F401
from ssl_tpu.archs.srresnet_arch import MSRResNet  # noqa: F401
from ssl_tpu.archs.srvgg_arch import SRVGGNetCompact  # noqa: F401


def build_network(opt: dict):
    """Instantiate a flax module from an option dict with a `type` key.

    `scale` in the option dict is forwarded when the arch declares it."""
    opt = deepcopy(opt)
    network_type = opt.pop("type")
    cls = ARCH_REGISTRY.get(network_type)
    fields = set(getattr(cls, "__dataclass_fields__", {}))
    kwargs = {k: v for k, v in opt.items() if k in fields}
    dropped = set(opt) - set(kwargs)
    if dropped:
        import logging
        logging.getLogger("ssl_tpu").debug("build_network(%s): ignoring keys %s", network_type, dropped)
    return cls(**kwargs)
