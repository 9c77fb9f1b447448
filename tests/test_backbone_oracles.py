"""Random-weight oracle parity for the weights-gated metric backbones.

The true pretrained weights (OpenAI CLIP RN50, torchvision VGG19, lpips
AlexNet, FID Inception) cannot enter this zero-egress sandbox, so their
numeric VALUES stay externally gated — but the architecture, converter and
scoring math can still be pinned against the reference's own executed code at
RANDOM weights.  These tests do exactly that:

- CLIP / CLIPIQA: the reference VENDORS its entire CLIP stack
  (GAN-Based-SR/clip/, clipiqa_pyiqa/clip_model.py, clipiqa_arch.py) — we
  execute it directly (tiny random model) and assert our flax towers, the
  converter, the tokenizer and the full 5-antonym-pair CLIPIQA score against
  it.
- VGG19 perceptual loss: reference archs/vgg_arch.py + losses/basic_loss.py
  PerceptualLoss run with a seeded random torchvision-layout vgg19 (the
  ref_loader stub builds the canonical architecture); our PerceptualLoss
  loads the same .pth and must produce equal percep/style losses.

With these, only the literal weight files remain external data: any supplied
checkpoint flows through converter paths proven elementwise-equal here.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from ref_loader import install_reference_stubs, ref_module  # noqa: E402

pytestmark = pytest.mark.slow

VENDORED_BPE = "/root/reference/GAN-Based-SR/clip/bpe_simple_vocab_16e6.txt.gz"


def _tiny_clip(seed: int = 0):
    """Reference vendored CLIP (clipiqa_pyiqa/clip_model.py:441) at toy size,
    randomly initialized by its own initialize_parameters()."""
    cm = ref_module("clipiqa_pyiqa.clip_model")
    torch.manual_seed(seed)
    model = cm.CLIP(embed_dim=64, image_resolution=64,
                    vision_layers=(1, 1, 1, 1), vision_width=16,
                    vision_patch_size=None, context_length=77,
                    vocab_size=49408, transformer_width=64,
                    transformer_heads=1, transformer_layers=2)
    # conv/bn junk from torch default init is fine; put BN in eval stats mode
    model.eval()
    return model


def _my_towers_from(model):
    from ssl_tpu.archs.clip_arch import CLIPTextEncoder, ModifiedResNet
    from ssl_tpu.utils.weight_port import convert_clip_rn50
    sd = {k: v.detach() for k, v in model.state_dict().items()}
    vis_p, vis_s, text_p = convert_clip_rn50(sd)
    visual = ModifiedResNet(layers=(1, 1, 1, 1), width=16, output_dim=64,
                            heads=8, attn_spacial_dim=2)
    text = CLIPTextEncoder(width=64, layers=2, heads=1, embed_dim=64,
                           vocab_size=49408)
    as_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return visual, as_j(vis_p), as_j(vis_s), text, as_j(text_p)


def test_clip_tokenizer_matches_vendored_reference():
    """Our SimpleTokenizer must produce the exact ids of the reference's
    vendored clip.tokenize for the real 49152-merge vocab (clip/clip.py:197)."""
    install_reference_stubs()
    import clip
    from ssl_tpu.metrics.clipiqa import ANTONYM_PROMPTS
    from ssl_tpu.utils.clip_tokenizer import SimpleTokenizer
    texts = ANTONYM_PROMPTS + ["Good photo.", "Bad photo.",
                               "a 4x super-resolution IMAGE!", "  spaces  "]
    ref = clip.tokenize(texts).numpy()
    ours = SimpleTokenizer(bpe_path=VENDORED_BPE).tokenize(texts)
    np.testing.assert_array_equal(ours, ref.astype(ours.dtype))


def test_clip_rn50_image_and_text_feature_parity():
    """encode_image(pos_embedding=False) + encode_text of the vendored CLIP
    (clip_model.py:538-554) vs our flax towers through convert_clip_rn50."""
    install_reference_stubs()
    import clip
    model = _tiny_clip()
    visual, vis_p, vis_s, text, text_p = _my_towers_from(model)

    rng = np.random.RandomState(0)
    img = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_img = model.encode_image(
            torch.from_numpy(img.transpose(0, 3, 1, 2)), pos_embedding=False)
    mine = visual.apply({"params": vis_p, "batch_stats": vis_s}, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(mine), ref_img.numpy(),
                               rtol=1e-4, atol=1e-5)

    toks = clip.tokenize(["Good image", "a bad, noisy image"])
    with torch.no_grad():
        ref_txt = model.encode_text(toks)
    mine_t = text.apply({"params": text_p}, jnp.asarray(toks.numpy(), jnp.int32))
    np.testing.assert_allclose(np.asarray(mine_t), ref_txt.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_clip_attnpool_pos_embedding_resize_parity():
    """pos_embedding=True path: the reference bicubic-resizes the whole
    (tokens, C) embedding matrix (clip_model.py:225-227); our token-axis
    torch-exact bicubic must match on a non-224-equivalent input size."""
    install_reference_stubs()
    model = _tiny_clip(seed=1)
    visual, vis_p, vis_s, _, _ = _my_towers_from(model)
    rng = np.random.RandomState(1)
    img = rng.rand(1, 96, 96, 3).astype(np.float32)  # 3x3 grid vs spacial 2x2
    with torch.no_grad():
        ref = model.encode_image(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                                 pos_embedding=True)
    mine = visual.apply({"params": vis_p, "batch_stats": vis_s},
                        jnp.asarray(img), use_pos=True)
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_clipiqa_full_score_parity(tmp_path, monkeypatch):
    """End-to-end CLIPIQA score: the reference's own CLIPIQA module
    (clipiqa_arch.py:96-132, the CLI's default model_type='clipiqa': 5
    antonym pairs, learned logit_scale, pos_embedding=False) vs our
    calculate_clipiqa on the same random backbone."""
    install_reference_stubs()
    arch_mod = ref_module("clipiqa_pyiqa.clipiqa_arch")
    model = _tiny_clip(seed=2)
    monkeypatch.setattr(arch_mod, "load", lambda *a, **k: model)
    ref_iqa = arch_mod.CLIPIQA(backbone="RN50")

    rng = np.random.RandomState(2)
    img_u8 = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    x = torch.from_numpy((img_u8.astype(np.float32) / 255.0
                          ).transpose(2, 0, 1))[None]
    with torch.no_grad():
        ref_score = float(ref_iqa(x, device="cpu"))

    pth = str(tmp_path / "clip_tiny.pt")
    torch.save({"state_dict": model.state_dict()}, pth)
    monkeypatch.setenv("CLIP_BPE_PATH", VENDORED_BPE)
    monkeypatch.delenv("CLIP_PROMPT_TOKENS_NPY", raising=False)
    from ssl_tpu.metrics.clipiqa import calculate_clipiqa
    mine = calculate_clipiqa(img_u8, weights_path=pth)
    assert abs(mine - ref_score) < 1e-5, (mine, ref_score)


def _seeded_vgg19_pth(tmp_path, seed=0):
    """Random torchvision-layout vgg19 features state dict (the ref_loader
    stub builds the canonical conv stack)."""
    install_reference_stubs()
    from torchvision.models import vgg
    torch.manual_seed(seed)
    net = vgg.vgg19()
    pth = str(tmp_path / "vgg19.pth")
    torch.save(net.state_dict(), pth)
    return pth


def test_fid_inception_pool3_parity(tmp_path, monkeypatch):
    """The reference's own archs/inception.py (fid_inception_v3 + the
    InceptionV3 wrapper with resize/normalize, :17-155) executed at random
    weights vs our flax InceptionV3FID through convert_fid_inception.
    Covers the FID patches: count_include_pad=False average pools
    (FIDInceptionA/C/E_1) and the max-pool branch in Mixed_7c (E_2)."""
    install_reference_stubs()
    import _tv_inception_stub as tv_inc
    inc_mod = ref_module("basicsr.archs.inception")

    torch.manual_seed(0)
    donor = tv_inc.inception_v3(num_classes=1008, aux_logits=False)
    # randomize BN stats too — init (0 mean, 1 var) would mask stat-loading bugs
    sd = donor.state_dict()
    g = torch.Generator().manual_seed(1)
    for k in sd:
        if k.endswith("running_mean"):
            sd[k] = torch.randn(sd[k].shape, generator=g) * 0.1
        elif k.endswith("running_var"):
            sd[k] = torch.rand(sd[k].shape, generator=g) + 0.5
    pth = str(tmp_path / "fid_inception.pth")
    torch.save(sd, pth)

    monkeypatch.setattr(inc_mod, "LOCAL_FID_WEIGHTS", pth)
    ref = inc_mod.InceptionV3(output_blocks=[3], resize_input=True,
                              normalize_input=True)
    ref.eval()
    rng = np.random.RandomState(0)
    img = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_feat = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)))[0]
    ref_feat = ref_feat.squeeze(-1).squeeze(-1).numpy()

    from ssl_tpu.metrics.fid import load_inception
    model, variables = load_inception(weights_path=pth)
    mine = np.asarray(model.apply(variables, jnp.asarray(img)))
    np.testing.assert_allclose(mine, ref_feat, rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# LPIPS / DISTS: the reference shells out to the `lpips` / `DISTS_pytorch`
# pip packages (not vendored, not installable here); the oracles below are
# faithful torch replicas of those packages' published scoring pipelines.
# ---------------------------------------------------------------------------


class _TorchLPIPSAlex(torch.nn.Module):
    """lpips.LPIPS(net='alex', lpips=True, spatial=False) semantics: scaling
    layer, AlexNet relu taps, unit-normalize over channels (eps 1e-10),
    squared diff, 1x1 lin heads, spatial average, sum over layers."""

    def __init__(self, features, lins):
        super().__init__()
        self.features = features
        self.lins = torch.nn.ParameterList(
            [torch.nn.Parameter(w) for w in lins])
        self.register_buffer("shift", torch.tensor(
            [-.030, -.088, -.188]).view(1, 3, 1, 1))
        self.register_buffer("scale", torch.tensor(
            [.458, .448, .450]).view(1, 3, 1, 1))

    def _taps(self, x):
        taps = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in (1, 4, 7, 9, 11):
                taps.append(x)
        return taps

    def forward(self, x, y):
        fx = self._taps((x - self.shift) / self.scale)
        fy = self._taps((y - self.shift) / self.scale)
        total = 0
        for a, b, w in zip(fx, fy, self.lins):
            a = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            b = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (a - b) ** 2
            total = total + torch.nn.functional.conv2d(d, w).mean([2, 3])
        return total


def _torch_alexnet_features(seed=0):
    torch.manual_seed(seed)
    cfg = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
           (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
    layers, pool_after = [], {0, 1}
    for i, (ci, co, k, s, p) in enumerate(cfg):
        layers += [torch.nn.Conv2d(ci, co, k, stride=s, padding=p),
                   torch.nn.ReLU()]
        if i in pool_after:
            layers.append(torch.nn.MaxPool2d(3, 2))
    layers.append(torch.nn.MaxPool2d(3, 2))
    return torch.nn.Sequential(*layers)


def test_lpips_alex_score_parity(tmp_path):
    """Torch replica of the lpips package pipeline vs our flax LPIPSAlex on a
    shared random AlexNet + non-negative lin heads (the official heads are
    trained with a non-negativity clamp)."""
    feats = _torch_alexnet_features()
    g = torch.Generator().manual_seed(3)
    lins = [torch.rand(1, c, 1, 1, generator=g) * 0.2
            for c in (64, 192, 384, 256, 256)]
    ref = _TorchLPIPSAlex(feats, lins)
    ref.eval()

    # lpips-package state-dict layout (net.sliceN.<orig_idx> backbone keys,
    # lin{i}.model.1.weight heads) to exercise that loader branch
    sd = {}
    slice_bounds = [(1, 0, 2), (2, 2, 5), (3, 5, 8), (4, 8, 10), (5, 10, 12)]
    for sl, lo, hi in slice_bounds:
        for idx in range(lo, hi):
            mod = feats[idx]
            if isinstance(mod, torch.nn.Conv2d):
                sd[f"net.slice{sl}.{idx}.weight"] = mod.weight.detach()
                sd[f"net.slice{sl}.{idx}.bias"] = mod.bias.detach()
    for i, w in enumerate(lins):
        sd[f"lin{i}.model.1.weight"] = w
    pth = str(tmp_path / "lpips_alex_full.pth")
    torch.save(sd, pth)

    rng = np.random.RandomState(0)
    a = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    b = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    # reference metric convention (metrics/lpips.py:47-57): [0,1] -> [-1,1]
    to_t = lambda im: torch.from_numpy(
        (im.astype(np.float32) / 255.0 * 2 - 1).transpose(2, 0, 1))[None]
    with torch.no_grad():
        ref_val = float(ref(to_t(a), to_t(b)))

    from ssl_tpu.metrics.lpips_metric import _CACHED, calculate_lpips
    _CACHED.clear()
    mine = calculate_lpips(a, b, weights_path=pth)
    assert abs(mine - ref_val) < 1e-5, (mine, ref_val)


class _TorchDISTS(torch.nn.Module):
    """DISTS_pytorch semantics: VGG16 stages with hann-window L2 pooling
    between stages, ImageNet normalization, per-channel alpha/beta weighted
    texture/structure similarity, score = 1 - sum."""

    class _L2Pool(torch.nn.Module):
        def __init__(self, channels, filter_size=5, stride=2):
            super().__init__()
            self.padding = (filter_size - 2) // 2
            self.stride = stride
            a = torch.hann_window(filter_size, periodic=False)[1:-1]
            g = (a[:, None] * a[None, :])
            g = g / g.sum()
            self.register_buffer("filter",
                                 g[None, None].repeat(channels, 1, 1, 1))

        def forward(self, x):
            out = torch.nn.functional.conv2d(
                x * x, self.filter, stride=self.stride, padding=self.padding,
                groups=x.shape[1])
            return (out + 1e-12).sqrt()

    def __init__(self, convs, alpha, beta):
        super().__init__()
        self.chns = [3, 64, 128, 256, 512, 512]
        stages = []
        ci = 0
        for si, n in enumerate((2, 2, 3, 3, 3)):
            layers = [] if si == 0 else [self._L2Pool(self.chns[si])]
            for _ in range(n):
                layers += [convs[ci], torch.nn.ReLU()]
                ci += 1
            stages.append(torch.nn.Sequential(*layers))
        self.stages = torch.nn.ModuleList(stages)
        self.register_buffer("mean", torch.tensor(
            [0.485, 0.456, 0.406]).view(1, 3, 1, 1))
        self.register_buffer("std", torch.tensor(
            [0.229, 0.224, 0.225]).view(1, 3, 1, 1))
        self.alpha = torch.nn.Parameter(alpha)
        self.beta = torch.nn.Parameter(beta)

    def _feats(self, x):
        h = (x - self.mean) / self.std
        outs = [x]
        for st in self.stages:
            h = st(h)
            outs.append(h)
        return outs

    def forward(self, x, y):
        f0, f1 = self._feats(x), self._feats(y)
        c1 = c2 = 1e-6
        w_sum = self.alpha.sum() + self.beta.sum()
        alpha = torch.split(self.alpha / w_sum, self.chns, dim=1)
        beta = torch.split(self.beta / w_sum, self.chns, dim=1)
        dist1 = dist2 = 0
        for k in range(len(self.chns)):
            xm = f0[k].mean([2, 3], keepdim=True)
            ym = f1[k].mean([2, 3], keepdim=True)
            s1 = (2 * xm * ym + c1) / (xm ** 2 + ym ** 2 + c1)
            dist1 = dist1 + (alpha[k] * s1).sum(1, keepdim=True)
            xv = ((f0[k] - xm) ** 2).mean([2, 3], keepdim=True)
            yv = ((f1[k] - ym) ** 2).mean([2, 3], keepdim=True)
            cov = (f0[k] * f1[k]).mean([2, 3], keepdim=True) - xm * ym
            s2 = (2 * cov + c2) / (xv + yv + c2)
            dist2 = dist2 + (beta[k] * s2).sum(1, keepdim=True)
        return 1 - (dist1 + dist2).squeeze()


def test_dists_score_parity(tmp_path):
    """Torch replica of DISTS_pytorch vs our flax DISTS on a shared random
    VGG16 + alpha/beta."""
    torch.manual_seed(4)
    cfg = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
           (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
           (512, 512), (512, 512)]
    convs = [torch.nn.Conv2d(ci, co, 3, padding=1) for ci, co in cfg]
    g = torch.Generator().manual_seed(5)
    total_c = 3 + 64 + 128 + 256 + 512 + 512
    alpha = torch.rand(1, total_c, 1, 1, generator=g)
    beta = torch.rand(1, total_c, 1, 1, generator=g)
    ref = _TorchDISTS(convs, alpha, beta)
    ref.eval()

    # dists full-model layout: positional 3x3 convs + alpha/beta
    sd = {"alpha": alpha, "beta": beta}
    for i, conv in enumerate(convs):
        sd[f"convs.{i}.weight"] = conv.weight.detach()
        sd[f"convs.{i}.bias"] = conv.bias.detach()
    pth = str(tmp_path / "dists_full.pt")
    torch.save(sd, pth)

    rng = np.random.RandomState(1)
    a = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    b = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    to_t = lambda im: torch.from_numpy(
        (im.astype(np.float32) / 255.0).transpose(2, 0, 1))[None]
    with torch.no_grad():
        # reference calculate_dists calls model(img2, img) (dists.py:48)
        ref_val = float(ref(to_t(b), to_t(a)))

    from ssl_tpu.metrics.dists_metric import _CACHE, calculate_dists
    _CACHE.clear()
    mine = calculate_dists(a, b, weights_path=pth)
    assert abs(mine - ref_val) < 1e-5, (mine, ref_val)


@pytest.mark.parametrize("criterion,style_weight", [("l1", 0.0), ("fro", 0.0),
                                                    ("l1", 0.5)])
def test_vgg_perceptual_loss_parity(tmp_path, monkeypatch, criterion,
                                    style_weight):
    """Reference PerceptualLoss (basic_loss.py:161-266) + VGGFeatureExtractor
    (vgg_arch.py:55-161) executed with a seeded random vgg19 vs ours loading
    the same .pth: percep and style losses elementwise-equal."""
    pth = _seeded_vgg19_pth(tmp_path)
    ref_vgg_mod = ref_module("basicsr.archs.vgg_arch")
    monkeypatch.setattr(ref_vgg_mod, "VGG_PRETRAIN_PATH", pth)
    ref_losses = ref_module("basicsr.losses.basic_loss")

    layer_weights = {"conv1_2": 0.1, "relu2_2": 0.25, "conv3_4": 1.0,
                     "pool4": 0.5}
    ref_loss = ref_losses.PerceptualLoss(
        layer_weights=layer_weights, vgg_type="vgg19", use_input_norm=True,
        range_norm=False, perceptual_weight=0.7, style_weight=style_weight,
        criterion=criterion)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 48, 48, 3).astype(np.float32)
    gt = rng.rand(2, 48, 48, 3).astype(np.float32)
    with torch.no_grad():
        ref_p, ref_s = ref_loss(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                torch.from_numpy(gt.transpose(0, 3, 1, 2)))

    from ssl_tpu.losses.perceptual import PerceptualLoss
    mine = PerceptualLoss(layer_weights=layer_weights, vgg_type="vgg19",
                          use_input_norm=True, range_norm=False,
                          perceptual_weight=0.7, style_weight=style_weight,
                          criterion=criterion, vgg_path=pth)
    my_p, my_s = mine(jnp.asarray(x), jnp.asarray(gt))
    np.testing.assert_allclose(float(my_p), float(ref_p), rtol=5e-4, atol=1e-5)
    if style_weight > 0:
        np.testing.assert_allclose(float(my_s), float(ref_s), rtol=5e-4,
                                   atol=1e-6)
