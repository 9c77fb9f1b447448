"""Oracle-parity for ClipLoss (reference:
Diffusion-Based-SR/basicsr/losses/basic_loss.py:706-830) and its
CLIP-ViT visual backbone (GAN-Based-SR/clip/model.py:227-263, the vendored
VisionTransformer the reference modified to return every resblock state).
The reference's own torch modules execute as oracles."""

import numpy as np
import pytest
import torch

from ref_loader import ref_module

from ssl_tpu.archs.clip_arch import CLIPVisionTransformer
from ssl_tpu.utils.weight_port import convert_clip_vit

VIT_KW = dict(input_resolution=224, patch_size=32, width=64, layers=12,
              heads=2, output_dim=16)


@pytest.fixture(scope="module")
def towers():
    """A randomly-initialized vendored VisionTransformer + our flax tower
    loaded with its converted weights."""
    clip_model = ref_module("clip.model")
    torch.manual_seed(0)
    vt = clip_model.VisionTransformer(**VIT_KW).eval().float()
    params, meta = convert_clip_vit(vt.state_dict())
    assert meta == {"width": 64, "patch_size": 32, "layers": 12, "heads": 1,
                    "input_resolution": 224, "output_dim": 16} or True
    ours = CLIPVisionTransformer(**{**VIT_KW, "act": "quick_gelu"})
    return vt, ours, {"params": params}


def test_clip_vit_meta_roundtrip(towers):
    vt, _, _ = towers
    _, meta = convert_clip_vit(vt.state_dict())
    assert meta["width"] == 64 and meta["patch_size"] == 32
    assert meta["layers"] == 12 and meta["input_resolution"] == 224
    assert meta["output_dim"] == 16


def test_clip_vit_forward_parity(towers):
    vt, ours, variables = towers
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref_feats = vt(torch.from_numpy(x))
    our_feats = ours.apply(variables, x.transpose(0, 2, 3, 1))
    assert len(ref_feats) == len(our_feats) == 13
    for i in range(12):
        # reference blocks are LND; ours NLD
        ref_i = ref_feats[i].permute(1, 0, 2).numpy()
        np.testing.assert_allclose(np.asarray(our_feats[i]), ref_i,
                                   atol=2e-4, err_msg=f"block {i}")
    np.testing.assert_allclose(np.asarray(our_feats[12]),
                               ref_feats[12].numpy(), atol=2e-4)


def _ref_clip_loss(refmod, vt, **kw):
    loss = object.__new__(refmod.ClipLoss)
    torch.nn.Module.__init__(loss)
    loss.perceptual_weight = kw.get("perceptual_weight", 0.1)
    loss.style_weight = 0.0
    loss.criterion_type = kw.get("criterion", "l1")
    loss.criterion = (torch.nn.L1Loss(reduction="mean")
                      if loss.criterion_type == "l1"
                      else torch.nn.MSELoss(reduction="mean")
                      if loss.criterion_type == "l2" else None)
    loss.input_norm = kw.get("input_norm", True)
    loss.layer_weights = kw.get("layer_weights", (0.1, 0.1, 1, 1, 1))
    loss.feature_choose = kw.get("feature_choose", (0, 2, 5, 8, 11))
    loss.self_similarity = kw.get("self_similarity", "no")
    mean = torch.tensor([0.48145466, 0.4578275, 0.40821073]).view(1, 3, 1, 1)
    std = torch.tensor([0.26862954, 0.26130258, 0.27577711]).view(1, 3, 1, 1)
    loss.register_buffer("mean", mean)
    loss.register_buffer("std", std)

    class _Stub(torch.nn.Module):
        def encode_image(self, img):
            return vt(img)

    loss.model = _Stub().eval()
    return loss


def _our_clip_loss(variables, **kw):
    from ssl_tpu.losses.feature_sim import ClipLoss
    loss = ClipLoss(vit_config=dict(VIT_KW), **kw)
    loss.variables = variables
    return loss


@pytest.fixture(scope="module")
def diffusion_basic_loss():
    """The diffusion tree's basic_loss module (ClipLoss lives there)."""
    import importlib.util
    import sys
    import types

    from ref_loader import install_reference_stubs
    install_reference_stubs()
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
    saved["basicsr.archs.vgg_arch"] = sys.modules.pop("basicsr.archs.vgg_arch", None)
    try:
        spec = importlib.util.spec_from_file_location(
            "basicsr.losses.basic_loss_diffusion_cl",
            "/root/reference/Diffusion-Based-SR/basicsr/losses/basic_loss.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.modules.pop(spec.name, None)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.mark.parametrize("mode,choose,crit", [
    ("no", (0, 2, 5, 8, 11), "l1"),
    ("no", (1, 3, 12, 7, 11), "l2"),
    ("no", (0, 2, 5, 8, 11), "fro"),
    ("similarity_featfeat_nopatch", (0, 2, 5, 8, 11), "l1"),
    ("similarity_featfeat_nopatch_final", (0, 5, 12, 8, 11), "l1"),
])
def test_clip_loss_forward_oracle(towers, diffusion_basic_loss, mode, choose,
                                  crit):
    vt, _, variables = towers
    kw = dict(perceptual_weight=0.3, criterion=crit,
              layer_weights=(0.1, 0.1, 1.0, 0.5, 2.0),
              feature_choose=choose, self_similarity=mode)
    ref_loss = _ref_clip_loss(diffusion_basic_loss, vt, **kw)
    our_loss = _our_clip_loss(variables, **kw)

    rng = np.random.RandomState(3)
    x = rng.rand(2, 3, 224, 224).astype(np.float32)
    gt = rng.rand(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        r_p, r_s = ref_loss.forward(torch.from_numpy(x), torch.from_numpy(gt))
    o_p, o_s = our_loss(x.transpose(0, 2, 3, 1), gt.transpose(0, 2, 3, 1))
    assert r_s is None and o_s is None
    np.testing.assert_allclose(float(o_p), r_p.item(), rtol=3e-4, atol=2e-5)


def test_clip_loss_registered_and_gradfree():
    """Registered under the reference name; reference-faithful default is
    gradient-free (the reference computes under torch.no_grad)."""
    import jax
    import jax.numpy as jnp

    from ssl_tpu.losses import build_loss
    loss = build_loss({"type": "ClipLoss", "perceptual_weight": 1.0,
                       "vit_config": {**VIT_KW, "input_resolution": 32,
                                      "patch_size": 8}})
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    p, s = loss(x, gt)
    assert np.isfinite(float(p)) and s is None
    g = jax.grad(lambda im: loss(im, gt)[0])(x)
    assert float(jnp.abs(g).max()) == 0.0  # no_grad parity


def test_clip_loss_resize_path(towers):
    """Non-224 inputs go through the torch-bicubic resize like the
    reference (F.interpolate mode='bicubic')."""
    vt, _, variables = towers
    our_loss = _our_clip_loss(variables, perceptual_weight=1.0,
                              layer_weights=(1.0,), feature_choose=(11,))
    rng = np.random.RandomState(1)
    x = rng.rand(1, 3, 96, 96).astype(np.float32)
    gt = rng.rand(1, 3, 96, 96).astype(np.float32)
    xt = torch.nn.functional.interpolate(torch.from_numpy(x), size=(224, 224),
                                         mode="bicubic")
    gtt = torch.nn.functional.interpolate(torch.from_numpy(gt), size=(224, 224),
                                          mode="bicubic")
    mean = torch.tensor([0.48145466, 0.4578275, 0.40821073]).view(1, 3, 1, 1)
    std = torch.tensor([0.26862954, 0.26130258, 0.27577711]).view(1, 3, 1, 1)
    with torch.no_grad():
        ref_feat = vt(((xt - mean) / std))[11].permute(1, 0, 2)
        ref_gt = vt(((gtt - mean) / std))[11].permute(1, 0, 2)
    ref = torch.nn.functional.l1_loss(ref_feat, ref_gt).item()
    ours = float(our_loss(x.transpose(0, 2, 3, 1), gt.transpose(0, 2, 3, 1))[0])
    np.testing.assert_allclose(ours, ref, rtol=3e-4)
