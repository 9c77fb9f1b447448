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
import importlib.util
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
    archs_pkg = _shell_package("basicsr.archs", f"{REF_GAN}/basicsr/archs")
    # the diffusion tree vendors the FULL basicsr arch zoo (EDSR/RCAN/ECBSR/
    # RIDNet/video/stylegan2/...); resolve those too, GAN tree taking priority
    archs_pkg.__path__.append(f"{REF_DIFF}/basicsr/archs")
    _shell_package("basicsr.metrics", f"{REF_GAN}/basicsr/metrics")
    _shell_package("basicsr.data", f"{REF_GAN}/basicsr/data")
    _shell_package("basicsr.ops", f"{REF_GAN}/basicsr/ops")
    # upfirdn2d ships a CPU-native fallback (upfirdn2d.py:154) — load for
    # real; expose the FUNCTION at package level (the shell skips the real
    # __init__.py's `from .upfirdn2d import upfirdn2d`)
    up_pkg = _shell_package("basicsr.ops.upfirdn2d",
                            f"{REF_DIFF}/basicsr/ops/upfirdn2d")
    up_impl = importlib.import_module("basicsr.ops.upfirdn2d.upfirdn2d")
    up_pkg.upfirdn2d = up_impl.upfirdn2d
    # fused_act has NO cpu fallback in the vendored copy (always calls the
    # CUDA ext): provide the documented native semantics
    # scale * leaky_relu(x + bias) (rosinality fused_bias_act contract)
    import torch as _torch
    import torch.nn.functional as _F
    fused = types.ModuleType("basicsr.ops.fused_act")

    def _fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5):
        if bias is not None:
            x = x + bias.reshape((1, -1) + (1,) * (x.ndim - 2))
        return _F.leaky_relu(x, negative_slope) * scale

    class _FusedLeakyReLU(_torch.nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = _torch.nn.Parameter(_torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, x):
            return _fused_leaky_relu(x, self.bias, self.negative_slope, self.scale)

    fused.fused_leaky_relu = _fused_leaky_relu
    fused.FusedLeakyReLU = _FusedLeakyReLU
    sys.modules["basicsr.ops.fused_act"] = fused

    # `from basicsr.utils import get_root_logger / bgr2ycbcr / ...` resolves
    # package-level attrs lazily from the real submodules (PEP 562)
    _utils_sources = ("color_util", "matlab_functions", "img_util", "misc",
                      "diffjpeg", "img_process_util")

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

    # basicsr.ops.dcn: the vendored op is CUDA-only; provide a faithful CPU
    # torch implementation of the mmcv modulated-deform-conv KERNEL semantics
    # (offset channels per deformable group interleaved (y,x) per kernel
    # position; zero padding outside; mask multiplies the sampled column)
    # so EDVR/IconVSR parity tests can run the reference modules end-to-end.
    dcn = types.ModuleType("basicsr.ops.dcn")

    def _mdc_cpu(x, offset, mask, weight, bias, stride=1, padding=0,
                 dilation=1, groups=1, deformable_groups=1):
        if isinstance(stride, tuple):
            stride = stride[0]
        if isinstance(padding, tuple):
            padding = padding[0]
        if isinstance(dilation, tuple):
            dilation = dilation[0]
        b, cin, h, w = x.shape
        cout, cin_g, kh, kw = weight.shape
        assert groups == 1, "oracle supports groups=1 (all reference uses)"
        ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
        wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
        dg = deformable_groups
        cg = cin // dg
        ys_base = (_torch.arange(ho, dtype=x.dtype) * stride - padding).view(1, ho, 1)
        xs_base = (_torch.arange(wo, dtype=x.dtype) * stride - padding).view(1, 1, wo)
        cols = x.new_zeros(b, cin, kh * kw, ho, wo)
        for g in range(dg):
            for p in range(kh * kw):
                i, j = divmod(p, kw)
                ys = ys_base + i * dilation + offset[:, g * 2 * kh * kw + 2 * p]
                xs = xs_base + j * dilation + offset[:, g * 2 * kh * kw + 2 * p + 1]
                y0 = _torch.floor(ys)
                x0 = _torch.floor(xs)
                wy1, wx1 = ys - y0, xs - x0
                acc = 0.0
                for dy, wy in ((0, 1 - wy1), (1, wy1)):
                    for dx, wx in ((0, 1 - wx1), (1, wx1)):
                        yy = (y0 + dy).long()
                        xx = (x0 + dx).long()
                        valid = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))
                        yyc = yy.clamp(0, h - 1)
                        xxc = xx.clamp(0, w - 1)
                        # gather per batch: (b, cg, ho, wo)
                        idx = (yyc * w + xxc).view(b, 1, -1).expand(b, cg, ho * wo)
                        vals = x[:, g * cg:(g + 1) * cg].reshape(b, cg, h * w) \
                            .gather(2, idx).view(b, cg, ho, wo)
                        acc = acc + vals * (wy * wx * valid.to(x.dtype)).unsqueeze(1)
                cols[:, g * cg:(g + 1) * cg, p] = acc * mask[:, g * kh * kw + p].unsqueeze(1)
        out = _torch.einsum("bcphw,ocp->bohw", cols, weight.reshape(cout, cin, kh * kw))
        if bias is not None:
            out = out + bias.view(1, -1, 1, 1)
        return out

    class _MDCPack(_torch.nn.Module):
        """mmcv ModulatedDeformConvPack-compatible base (state-dict layout:
        weight, bias, conv_offset.weight, conv_offset.bias)."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, deformable_groups=1,
                     bias=True):
            super().__init__()
            k = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
            self.in_channels, self.out_channels = in_channels, out_channels
            self.kernel_size = (k, k)
            self.stride, self.padding, self.dilation = stride, padding, dilation
            self.groups, self.deformable_groups = groups, deformable_groups
            self.weight = _torch.nn.Parameter(
                _torch.randn(out_channels, in_channels // groups, k, k) * 0.02)
            self.bias = _torch.nn.Parameter(_torch.zeros(out_channels)) if bias else None
            self.conv_offset = _torch.nn.Conv2d(
                in_channels, deformable_groups * 3 * k * k, kernel_size=k,
                stride=stride, padding=padding, bias=True)
            self.conv_offset.weight.data.zero_()
            self.conv_offset.bias.data.zero_()

        def forward(self, x):
            out = self.conv_offset(x)
            o1, o2, m = _torch.chunk(out, 3, dim=1)
            offset = _torch.cat((o1, o2), dim=1)
            return _mdc_cpu(x, offset, _torch.sigmoid(m), self.weight, self.bias,
                            self.stride, self.padding, self.dilation,
                            self.groups, self.deformable_groups)

    dcn.ModulatedDeformConvPack = _MDCPack
    dcn.modulated_deform_conv = _mdc_cpu
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

            for _n in ("vgg11", "vgg13", "vgg16_bn", "vgg19_bn"):
                setattr(tv_vgg, _n, _no_tv)

            # vgg16/vgg19: build the standard architecture with RANDOM
            # weights so VGG-based reference modules (DFDNet, perceptual
            # loss, DISTS backbone) can run as oracles (no pretrained
            # weights in this zero-egress sandbox; parity tests randomize
            # weights anyway)
            _VGG_CFGS = {
                16: [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                     512, 512, 512, "M", 512, 512, 512, "M"],
                19: [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                     512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
            }

            def _make_vgg(depth):
                def _vgg(pretrained=False, **kwargs):
                    layers = []
                    cin = 3
                    for v in _VGG_CFGS[depth]:
                        if v == "M":
                            layers.append(_torch.nn.MaxPool2d(2, 2))
                        else:
                            layers.append(_torch.nn.Conv2d(cin, v, 3, padding=1))
                            layers.append(_torch.nn.ReLU(inplace=True))
                            cin = v
                    net = _torch.nn.Module()
                    net.features = _torch.nn.Sequential(*layers)
                    return net
                return _vgg

            tv_vgg.vgg19 = _make_vgg(19)
            tv_vgg.vgg16 = _make_vgg(16)
            tv_vgg.VGG19_Weights = type("VGG19_Weights", (), {"DEFAULT": None})
            tv_vgg.VGG16_Weights = type("VGG16_Weights", (), {"DEFAULT": None})
            tv_models.vgg = tv_vgg
            # inception: faithful torch re-implementation of the canonical
            # inception_v3 architecture (random weights) so the reference's
            # archs/inception.py (fid_inception_v3 subclasses
            # models.inception.InceptionA/C/E) executes for real
            import _tv_inception_stub as _inc
            sys.modules["torchvision.models.inception"] = _inc
            tv_models.inception = _inc
            tv_models.inception_v3 = _inc.inception_v3
            tv.models = tv_models
            # torchvision.ops.deform_conv2d (used by basicvsrpp's
            # SecondOrderDeformableAlignment) shares the mmcv offset layout;
            # route to the CPU implementation below
            tv_ops = types.ModuleType("torchvision.ops")

            def _tv_deform_conv2d(input, offset, weight, bias=None, stride=1,
                                  padding=0, dilation=1, mask=None):
                kh, kw = weight.shape[-2], weight.shape[-1]
                dg = offset.shape[1] // (2 * kh * kw)
                return _mdc_cpu(input, offset, mask, weight, bias, stride,
                                padding, dilation, 1, dg)

            tv_ops.deform_conv2d = _tv_deform_conv2d
            tv.ops = tv_ops
            # img_util.py imports make_grid top-level; only tensor2img's
            # multi-image path calls it (oracles pass single tensors)
            tv_utils = types.ModuleType("torchvision.utils")
            tv_utils.make_grid = _no_cuda
            tv.utils = tv_utils
            sys.modules["torchvision.utils"] = tv_utils
            # degradations.py imports rgb_to_grayscale from the (removed in
            # modern torchvision) functional_tensor module; faithful stub of
            # the torchvision implementation: 0.2989 r + 0.587 g + 0.114 b
            tv_transforms = types.ModuleType("torchvision.transforms")
            tv_transforms.__path__ = []
            tv_ft = types.ModuleType("torchvision.transforms.functional_tensor")

            def _rgb_to_grayscale(img, num_output_channels=1):
                r, g, b_ = img.unbind(dim=-3)
                l_img = (0.2989 * r + 0.587 * g + 0.114 * b_).to(img.dtype)
                l_img = l_img.unsqueeze(dim=-3)
                if num_output_channels == 3:
                    l_img = l_img.expand(img.shape)
                return l_img

            tv_ft.rgb_to_grayscale = _rgb_to_grayscale
            tv_transforms.functional_tensor = tv_ft
            tv.transforms = tv_transforms
            sys.modules["torchvision.transforms"] = tv_transforms
            sys.modules["torchvision.transforms.functional_tensor"] = tv_ft
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.models"] = tv_models
            sys.modules["torchvision.models.vgg"] = tv_vgg
            sys.modules["torchvision.ops"] = tv_ops

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

    # the real (diffusion-tree) stylegan2_arch now imports cleanly on CPU via
    # the fused_act stub + upfirdn2d native fallback, so openaimodel's
    # ConvLayer/EqualConv2d imports resolve from the genuine module.

    # the GAN tree's arch_util (priority on the shared path) lacks
    # PixelShufflePack, which basicvsrpp_arch imports; graft it from the
    # diffusion tree's arch_util
    arch_util = importlib.import_module("basicsr.archs.arch_util")
    if not hasattr(arch_util, "PixelShufflePack"):
        spec = importlib.util.spec_from_file_location(
            "basicsr.archs._arch_util_diff", f"{REF_DIFF}/basicsr/archs/arch_util.py")
        diff_util = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = diff_util
        spec.loader.exec_module(diff_util)
        arch_util.PixelShufflePack = diff_util.PixelShufflePack

    # ---- KAIR subtree (utils_blindsr as degradation oracle) ----
    _shell_package("train_BSGRAN", f"{REF_GAN}/train_BSGRAN")
    _shell_package("train_BSGRAN.utils", f"{REF_GAN}/train_BSGRAN/utils")

    # ---- GAN-tree model files as oracles (BBL / imresize / degradation) ----
    # model modules import the builders from package level (real __init__s are
    # skipped); stub them — oracle tests construct classes directly.
    _shell_package("basicsr.models", f"{REF_GAN}/basicsr/models")
    for pkg_name, attr in (("basicsr.archs", "build_network"),
                           ("basicsr.losses", "build_loss"),
                           ("basicsr.metrics", "calculate_metric"),
                           ("basicsr.data", "build_dataloader"),
                           ("basicsr.data", "build_dataset")):
        pkg = sys.modules[pkg_name]
        if not hasattr(pkg, attr):
            setattr(pkg, attr, _no_cuda)

    # ---- vendored CLIP + clipiqa (CLIPIQA oracle) ----
    # clip/clip.py imports pkg_resources.packaging and ftfy at module level;
    # neither is in this image.  packaging itself IS available; ftfy's
    # fix_text is identity on the clean ASCII prompt strings the oracles use.
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            import packaging as _packaging
            pr = types.ModuleType("pkg_resources")
            pr.packaging = _packaging
            if not hasattr(_packaging, "version"):
                import packaging.version  # noqa: F401
            sys.modules["pkg_resources"] = pr
    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401
        except ImportError:
            ftfy_stub = types.ModuleType("ftfy")
            ftfy_stub.fix_text = lambda s: s
            sys.modules["ftfy"] = ftfy_stub
    # clip/clip.py's preprocessing imports (never exercised by the oracles —
    # CLIPIQA feeds tensors directly)
    tv_transforms = sys.modules.get("torchvision.transforms")
    if tv_transforms is not None:
        for _n in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
            if not hasattr(tv_transforms, _n):
                setattr(tv_transforms, _n, _no_cuda)
        if not hasattr(tv_transforms, "InterpolationMode"):
            tv_transforms.InterpolationMode = type(
                "InterpolationMode", (), {"BICUBIC": "bicubic"})
    clip_pkg = _shell_package("clip", f"{REF_GAN}/clip")
    _shell_package("clipiqa_pyiqa", f"{REF_GAN}/clipiqa_pyiqa")
    # expose clip.tokenize (the shell package skips clip/__init__.py's
    # `from .clip import *`); the submodule builds the tokenizer from the
    # vendored bpe_simple_vocab_16e6.txt.gz at import time
    try:
        clip_impl = importlib.import_module("clip.clip")
        clip_pkg.tokenize = clip_impl.tokenize
    except Exception as e:  # pragma: no cover - keep other oracles usable
        clip_pkg.tokenize = _no_cuda
        logging.getLogger(__name__).warning("vendored clip unavailable: %s", e)

    _installed = True


def ref_module(name: str):
    """Import a reference module (e.g. 'basicsr.losses.loss_util')."""
    install_reference_stubs()
    return importlib.import_module(name)


def kair_models_module(name: str):
    """Import a KAIR arch module (train_BSGRAN/models/<name>.py) — they use
    absolute 'import models.basicblock' so a top-level 'models' shell points
    at the KAIR models dir (test-process-scoped)."""
    install_reference_stubs()
    if "models" not in sys.modules:
        _shell_package("models", f"{REF_GAN}/train_BSGRAN/models")
    return importlib.import_module(f"models.{name}")
