"""Oracle-parity tests for the diffusion-tree's extra registered losses
(reference Diffusion-Based-SR/basicsr/losses/basic_loss.py:613-693:
CosineDistanceLoss, BCELoss, KLDistanceLoss1, MaxDistanceLoss, SmoothL2Loss)
and the upstream GANFeatLoss consumed by HiFaceGANModel.

The reference classes are executed in place as oracles (nothing vendored)."""

import importlib.util
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ssl_tpu.losses import build_loss
from tests.ref_loader import install_reference_stubs

pytestmark = pytest.mark.slow

REF_BASIC_LOSS = "/root/reference/Diffusion-Based-SR/basicsr/losses/basic_loss.py"


@pytest.fixture(scope="module")
def refmod():
    install_reference_stubs()
    # isolate: a no-op registry (the real one would clash with GAN-tree
    # same-name registrations in this process) and a pytorch_msssim stub
    # (not installed; only SSIMLoss uses it)
    saved = {k: sys.modules.get(k) for k in ("pytorch_msssim",
                                             "basicsr.utils.registry")}
    msssim = types.ModuleType("pytorch_msssim")
    msssim.ssim = msssim.ms_ssim = msssim.SSIM = msssim.MS_SSIM = None
    sys.modules["pytorch_msssim"] = msssim
    fake_reg = types.ModuleType("basicsr.utils.registry")

    class _NoopRegistry:
        def register(self, *a, **k):
            return lambda obj: obj

    for name in ("LOSS_REGISTRY", "ARCH_REGISTRY", "MODEL_REGISTRY",
                 "DATASET_REGISTRY", "METRIC_REGISTRY"):
        setattr(fake_reg, name, _NoopRegistry())
    sys.modules["basicsr.utils.registry"] = fake_reg
    # vgg_arch may already be imported bound to the real registry; drop the
    # cached copy so the stubbed import path is used
    saved["basicsr.archs.vgg_arch"] = sys.modules.pop("basicsr.archs.vgg_arch", None)
    try:
        # named inside basicsr.losses so the module's relative
        # `.loss_util` import resolves (weighted_loss is tree-identical)
        spec = importlib.util.spec_from_file_location(
            "basicsr.losses.basic_loss_diffusion", REF_BASIC_LOSS)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _pair(shape=(2, 3, 4, 5), seed=0, positive=False):
    rng = np.random.RandomState(seed)
    x = rng.rand(*shape).astype(np.float32)
    y = rng.rand(*shape).astype(np.float32)
    if not positive:
        x, y = x * 2 - 1, y * 2 - 1
    return x, y


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_kl_distance_loss1(refmod, reduction):
    x, y = _pair(positive=True)
    ref = refmod.KLDistanceLoss1(loss_weight=0.7, reduction=reduction)
    ours = build_loss({"type": "KLDistanceLoss1", "loss_weight": 0.7,
                       "reduction": reduction})
    r = float(ref(torch.from_numpy(x), torch.from_numpy(y)))
    o = float(ours(jnp.asarray(x), jnp.asarray(y)))
    assert abs(r - o) < 1e-5 * max(1.0, abs(r)), (r, o)


def test_cosine_distance_loss(refmod):
    x, y = _pair()
    ref = refmod.CosineDistanceLoss(loss_weight=0.3)
    ours = build_loss({"type": "CosineDistanceLoss", "loss_weight": 0.3})
    r = float(ref(torch.from_numpy(x), torch.from_numpy(y)))
    o = float(ours(jnp.asarray(x), jnp.asarray(y)))
    assert abs(r - o) < 1e-5 * max(1.0, abs(r)), (r, o)


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_bce_loss(refmod, reduction):
    x, y = _pair(positive=True)
    x = np.clip(x, 1e-4, 1 - 1e-4)
    ref = refmod.BCELoss(loss_weight=0.5, reduction=reduction)
    ours = build_loss({"type": "BCELoss", "loss_weight": 0.5,
                       "reduction": reduction})
    r = float(ref(torch.from_numpy(x), torch.from_numpy(y)))
    o = float(ours(jnp.asarray(x), jnp.asarray(y)))
    assert abs(r - o) < 1e-4 * max(1.0, abs(r)), (r, o)


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_max_distance_loss(refmod, reduction):
    x, y = _pair()
    ref = refmod.MaxDistanceLoss(loss_weight=0.9, reduction=reduction)
    ours = build_loss({"type": "MaxDistanceLoss", "loss_weight": 0.9,
                       "reduction": reduction})
    r = float(ref(torch.from_numpy(x), torch.from_numpy(y)))
    o = float(ours(jnp.asarray(x), jnp.asarray(y)))
    assert abs(r - o) < 1e-6 * max(1.0, abs(r)), (r, o)


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_smooth_l2_loss(refmod, reduction):
    x, y = _pair()
    ref = refmod.SmoothL2Loss(delta=0.1, loss_weight=1.3, reduction=reduction)
    ours = build_loss({"type": "SmoothL2Loss", "delta": 0.1, "loss_weight": 1.3,
                       "reduction": reduction})
    r = float(ref(torch.from_numpy(x), torch.from_numpy(y)))
    o = float(ours(jnp.asarray(x), jnp.asarray(y)))
    assert abs(r - o) < 1e-5 * max(1.0, abs(r)), (r, o)


def test_gan_feat_loss_matches_manual():
    """GANFeatLoss == mean-L1 over intermediate feats, averaged across
    sub-discriminators (upstream BasicSR semantics)."""
    rng = np.random.RandomState(0)
    fake = [[jnp.asarray(rng.rand(2, 4, 4, 3), jnp.float32) for _ in range(3)]
            for _ in range(2)]
    real = [[jnp.asarray(rng.rand(2, 4, 4, 3), jnp.float32) for _ in range(3)]
            for _ in range(2)]
    loss = build_loss({"type": "GANFeatLoss", "criterion": "l1", "loss_weight": 2.0})
    got = float(loss(fake, real))
    want = 0.0
    for i in range(2):
        for j in range(2):  # last entry (logits) excluded
            want += float(jnp.mean(jnp.abs(fake[i][j] - real[i][j]))) / 2
    want *= 2.0
    assert abs(got - want) < 1e-6
