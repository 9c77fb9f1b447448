"""Load modules from the read-only reference checkout as TEST ORACLES.

The parity suite (test_reference_parity.py) executes the reference's OWN
torch/numpy code (ssl_pytorch, arch forwards, matlab imresize, DiffJPEG,
psnr_ssim, NIQE) on CPU and asserts our TPU-native implementations against
it — instead of self-written naive models.

The reference package can't be imported directly: ``basicsr/__init__.py``
imports the world and the CUDA similarity wrapper hard-exits without a GPU
(similaritywrapper.py:11-13).  So we install *shell* packages whose
``__path__`` points at the reference directories (submodules load lazily from
disk without executing the real ``__init__``s) and stub the few hard deps:
the CUDA wrapper, torchvision, and basicsr.ops.dcn (import-time only for the
archs we test).

Nothing from the reference is copied — it is imported in place, read-only.
"""

from __future__ import annotations

import importlib
import logging
import sys
import types

REF_ROOT = "/root/reference"
REF_GAN = f"{REF_ROOT}/GAN-Based-SR"
REF_DIFF = f"{REF_ROOT}/Diffusion-Based-SR"

_installed = False


def _shell_package(name: str, path: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    mod.__package__ = name
    sys.modules[name] = mod
    return mod


def install_reference_stubs() -> None:
    """Idempotent: set up sys.modules so ``basicsr.*`` resolves from the
    reference tree with CUDA/vendored deps stubbed."""
    global _installed
    if _installed:
        return

    # shell packages (real dirs, no real __init__ execution)
    _shell_package("basicsr", f"{REF_GAN}/basicsr")
    utils_pkg = _shell_package("basicsr.utils", f"{REF_GAN}/basicsr/utils")
    _shell_package("basicsr.losses", f"{REF_GAN}/basicsr/losses")
    _shell_package("basicsr.losses.similarity", f"{REF_GAN}/basicsr/losses/similarity")
    _shell_package("basicsr.archs", f"{REF_GAN}/basicsr/archs")
    _shell_package("basicsr.metrics", f"{REF_GAN}/basicsr/metrics")
    _shell_package("basicsr.data", f"{REF_GAN}/basicsr/data")
    _shell_package("basicsr.ops", f"{REF_GAN}/basicsr/ops")

    # `from basicsr.utils import get_root_logger / bgr2ycbcr / ...` resolves
    # package-level attrs lazily from the real submodules (PEP 562)
    _utils_sources = ("color_util", "matlab_functions", "img_util", "misc")

    def _utils_getattr(attr):
        if attr == "get_root_logger":
            return lambda *a, **k: logging.getLogger("ref_basicsr")
        for sub in _utils_sources:
            m = importlib.import_module(f"basicsr.utils.{sub}")
            if hasattr(m, attr):
                return getattr(m, attr)
        raise AttributeError(attr)

    utils_pkg.__getattr__ = _utils_getattr  # type: ignore[attr-defined]

    # CUDA similarity wrapper: parity tests use ssl_mode='pytorch' only
    simw = types.ModuleType("basicsr.losses.similarity.similaritywrapper")

    def _no_cuda(*a, **k):
        raise RuntimeError("CUDA similarity op not available in the oracle "
                           "loader; use ssl_mode='pytorch'")

    simw.compute_similarity = _no_cuda
    sys.modules["basicsr.losses.similarity.similaritywrapper"] = simw

    # basicsr.ops.dcn: imported at arch_util top level, never called by the
    # archs under test
    dcn = types.ModuleType("basicsr.ops.dcn")
    dcn.ModulatedDeformConvPack = type("ModulatedDeformConvPack", (), {})
    dcn.modulated_deform_conv = _no_cuda
    sys.modules["basicsr.ops.dcn"] = dcn

    # torchvision: arch_util imports it top-level and vgg_arch does
    # `from torchvision.models import vgg` (+ VGG19_Weights at call time);
    # the functions we exercise never instantiate a torchvision model
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv.__version__ = "0.0.0-stub"
            tv.__path__ = []  # mark as package
            tv_models = types.ModuleType("torchvision.models")
            tv_models.__path__ = []
            tv_vgg = types.ModuleType("torchvision.models.vgg")

            def _no_tv(*a, **k):
                raise RuntimeError("torchvision stub: pretrained models "
                                   "unavailable in the oracle loader")

            for _n in ("vgg11", "vgg13", "vgg16", "vgg19", "vgg16_bn", "vgg19_bn"):
                setattr(tv_vgg, _n, _no_tv)
            tv_vgg.VGG19_Weights = type("VGG19_Weights", (), {"DEFAULT": None})
            tv_vgg.VGG16_Weights = type("VGG16_Weights", (), {"DEFAULT": None})
            tv_models.vgg = tv_vgg
            tv.models = tv_models
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.models"] = tv_models
            sys.modules["torchvision.models.vgg"] = tv_vgg

    # ---- diffusion tree (ldm) shells ----
    _shell_package("ldm", f"{REF_DIFF}/ldm")
    _shell_package("ldm.modules", f"{REF_DIFF}/ldm/modules")
    _shell_package("ldm.modules.diffusionmodules",
                   f"{REF_DIFF}/ldm/modules/diffusionmodules")

    # omegaconf: openaimodel type-checks context_dim against ListConfig
    if "omegaconf" not in sys.modules:
        try:
            import omegaconf  # noqa: F401
        except ImportError:
            oc = types.ModuleType("omegaconf")
            oc.__path__ = []
            lc = types.ModuleType("omegaconf.listconfig")
            lc.ListConfig = type("ListConfig", (), {})
            oc.listconfig = lc
            sys.modules["omegaconf"] = oc
            sys.modules["omegaconf.listconfig"] = lc

    # ldm.util is only needed for instantiate_from_config (unused in oracles)
    ldm_util = types.ModuleType("ldm.util")
    ldm_util.instantiate_from_config = _no_cuda
    ldm_util.exists = lambda v: v is not None
    ldm_util.default = lambda v, d: v if v is not None else (d() if callable(d) else d)
    sys.modules["ldm.util"] = ldm_util

    # openaimodel imports ConvLayer/EqualConv2d from the vendored
    # stylegan2_arch (which would pull CUDA ops); only dead classes use them
    sg2 = types.ModuleType("basicsr.archs.stylegan2_arch")
    sg2.ConvLayer = type("ConvLayer", (), {})
    sg2.EqualConv2d = type("EqualConv2d", (), {})
    sys.modules["basicsr.archs.stylegan2_arch"] = sg2

    _installed = True


def ref_module(name: str):
    """Import a reference module (e.g. 'basicsr.losses.loss_util')."""
    install_reference_stubs()
    return importlib.import_module(name)
