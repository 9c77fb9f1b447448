"""Metric tests: PSNR/SSIM known values, NIQE fit+score ordering, FID math."""
import os

import numpy as np
import pytest

from ssl_tpu.metrics import calculate_metric
from ssl_tpu.metrics.psnr_ssim import calculate_psnr, calculate_ssim

pytestmark = pytest.mark.slow


def test_psnr_known_values():
    a = np.full((32, 32, 3), 100.0)
    b = np.full((32, 32, 3), 110.0)  # mse=100 -> psnr = 10*log10(255^2/100)
    p = calculate_psnr(a, b)
    assert abs(p - 10 * np.log10(255.0 ** 2 / 100.0)) < 1e-6
    assert calculate_psnr(a, a) == float("inf")


def test_ssim_identity_and_degradation():
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.float64)
    assert calculate_ssim(img, img) > 0.9999
    noisy = np.clip(img + rng.randn(64, 64, 3) * 25, 0, 255)
    s = calculate_ssim(img, noisy)
    assert 0 < s < 0.95


def test_metric_dispatcher():
    a = np.full((16, 16, 3), 100.0)
    b = np.full((16, 16, 3), 110.0)
    val = calculate_metric({"img": a, "img2": b},
                           {"type": "calculate_psnr", "crop_border": 0, "better": "higher"})
    assert np.isfinite(val)


def test_niqe_fit_and_ordering(tmp_path):
    """Fit pristine params from smooth natural-ish images; heavily degraded
    images must score worse (higher NIQE)."""
    import cv2
    from ssl_tpu.metrics.niqe import calculate_niqe, fit_niqe_params
    rng = np.random.RandomState(0)
    folder = str(tmp_path / "pristine")
    os.makedirs(folder)
    for i in range(4):
        # structured image: smooth gradients + texture
        yy, xx = np.mgrid[0:224, 0:224] / 224.0
        img = (np.stack([np.sin(8 * yy + i) * 0.4 + 0.5,
                         xx * 0.8, (yy + xx) / 2], -1) * 255)
        img += rng.randn(224, 224, 3) * 8
        cv2.imwrite(os.path.join(folder, f"p{i}.png"), np.clip(img, 0, 255).astype(np.uint8))
    params_path = str(tmp_path / "pris.npz")
    fit_niqe_params(folder, params_path)

    yy, xx = np.mgrid[0:224, 0:224] / 224.0
    clean = (np.stack([np.sin(8 * yy) * 0.4 + 0.5, xx * 0.8, (yy + xx) / 2], -1) * 255)
    clean = np.clip(clean + rng.randn(224, 224, 3) * 8, 0, 255)
    degraded = np.clip(clean + rng.randn(224, 224, 3) * 60, 0, 255)
    s_clean = calculate_niqe(clean, pris_params_path=params_path)
    s_degraded = calculate_niqe(degraded, pris_params_path=params_path)
    assert np.isfinite(s_clean) and np.isfinite(s_degraded)
    assert s_degraded > s_clean


def test_fid_math():
    from ssl_tpu.metrics.fid import calculate_fid_from_stats, stats_from_features
    rng = np.random.RandomState(0)
    f1 = rng.randn(200, 16)
    f2 = rng.randn(200, 16)
    mu1, s1 = stats_from_features(f1)
    mu2, s2 = stats_from_features(f2)
    same = calculate_fid_from_stats(mu1, s1, mu1, s1)
    diff = calculate_fid_from_stats(mu1, s1, mu2 + 3.0, s2)
    assert abs(same) < 1e-6
    assert diff > 100


def test_dists_arch_scoring():
    import jax
    import jax.numpy as jnp
    from ssl_tpu.metrics.dists_metric import DISTS
    m = DISTS()
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    y = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x, y)
    assert abs(float(m.apply(v, x, x)[0])) < 1e-4  # identical -> distance 0
    assert float(m.apply(v, x, y)[0]) > 0.1


def test_clip_rn50_conversion_and_clipiqa(tmp_path, monkeypatch):
    """Synthetic OpenAI-CLIP-layout RN50 checkpoint -> flax towers; CLIPIQA
    end-to-end on random weights (score in (0,1))."""
    import torch
    from ssl_tpu.utils.weight_port import convert_clip_rn50
    width, embed, twidth = 8, 16, 64
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, co, ci, k):
        sd[f"{name}.weight"] = torch.from_numpy(rng.randn(co, ci, k, k).astype(np.float32) * 0.05)

    def bn(name, c):
        sd[f"{name}.weight"] = torch.ones(c)
        sd[f"{name}.bias"] = torch.zeros(c)
        sd[f"{name}.running_mean"] = torch.zeros(c)
        sd[f"{name}.running_var"] = torch.ones(c)

    def dense(name, co, ci):
        sd[f"{name}.weight"] = torch.from_numpy(rng.randn(co, ci).astype(np.float32) * 0.05)
        sd[f"{name}.bias"] = torch.zeros(co)

    conv("visual.conv1", width // 2, 3, 3); bn("visual.bn1", width // 2)
    conv("visual.conv2", width // 2, width // 2, 3); bn("visual.bn2", width // 2)
    conv("visual.conv3", width, width // 2, 3); bn("visual.bn3", width)
    cin = width
    for li in range(1, 5):
        planes = width * 2 ** (li - 1)
        base = f"visual.layer{li}.0"
        conv(f"{base}.conv1", planes, cin, 1); bn(f"{base}.bn1", planes)
        conv(f"{base}.conv2", planes, planes, 3); bn(f"{base}.bn2", planes)
        conv(f"{base}.conv3", planes * 4, planes, 1); bn(f"{base}.bn3", planes * 4)
        conv(f"{base}.downsample.0", planes * 4, cin, 1)
        bn(f"{base}.downsample.1", planes * 4)
        cin = planes * 4
    ap = "visual.attnpool"
    sd[f"{ap}.positional_embedding"] = torch.from_numpy(
        rng.randn(50, cin).astype(np.float32) * 0.02)
    for n in ("q_proj", "k_proj", "v_proj"):
        dense(f"{ap}.{n}", cin, cin)
    dense(f"{ap}.c_proj", embed, cin)
    # text tower (2 blocks)
    sd["token_embedding.weight"] = torch.from_numpy(rng.randn(512, twidth).astype(np.float32) * 0.02)
    sd["positional_embedding"] = torch.from_numpy(rng.randn(77, twidth).astype(np.float32) * 0.01)
    for i in range(2):
        b = f"transformer.resblocks.{i}"
        sd[f"{b}.ln_1.weight"] = torch.ones(twidth); sd[f"{b}.ln_1.bias"] = torch.zeros(twidth)
        sd[f"{b}.attn.in_proj_weight"] = torch.from_numpy(
            rng.randn(3 * twidth, twidth).astype(np.float32) * 0.05)
        sd[f"{b}.attn.in_proj_bias"] = torch.zeros(3 * twidth)
        dense(f"{b}.attn.out_proj", twidth, twidth)
        sd[f"{b}.ln_2.weight"] = torch.ones(twidth); sd[f"{b}.ln_2.bias"] = torch.zeros(twidth)
        dense(f"{b}.mlp.c_fc", 4 * twidth, twidth)
        dense(f"{b}.mlp.c_proj", twidth, 4 * twidth)
    sd["ln_final.weight"] = torch.ones(twidth); sd["ln_final.bias"] = torch.zeros(twidth)
    sd["text_projection"] = torch.from_numpy(rng.randn(twidth, embed).astype(np.float32) * 0.05)
    path = str(tmp_path / "clip_rn50.pt")
    torch.save({"state_dict": sd}, path)

    vis_p, vis_s, text_p = convert_clip_rn50(torch.load(path, weights_only=False)["state_dict"])
    assert "layer4_0" in vis_p and "resblock_1" in text_p

    from ssl_tpu.metrics.clipiqa import calculate_clipiqa
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    toks = np.zeros((2, 77), np.int64)
    toks[:, 0] = 1
    toks[0, 1], toks[1, 1] = 100, 200
    toks[:, 2] = 511  # eot = max id
    score = calculate_clipiqa(img, weights_path=path, prompt_tokens=toks)
    assert 0.0 < score < 1.0


def test_lpips_weight_loading_and_score(tmp_path):
    """Synthetic torchvision-alexnet + lpips-lin state dicts -> working LPIPS:
    identical images score ~0, different images score > 0."""
    import torch
    from ssl_tpu.metrics.lpips_metric import calculate_lpips, _CACHED
    rng = np.random.RandomState(0)
    sd = {}
    # torchvision alexnet layout (features.N)
    shapes = [(0, 64, 3, 11), (3, 192, 64, 5), (6, 384, 192, 3),
              (8, 256, 384, 3), (10, 256, 256, 3)]
    for idx, co, ci, k in shapes:
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            rng.randn(co, ci, k, k).astype(np.float32) * 0.05)
        sd[f"features.{idx}.bias"] = torch.zeros(co)
    # lpips lin heads
    for i, c in enumerate((64, 192, 384, 256, 256)):
        sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.randn(1, c, 1, 1)).astype(np.float32) * 0.1)
    path = str(tmp_path / "lpips_alex.pth")
    torch.save(sd, path)

    _CACHED.clear()
    a = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    b = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    same = calculate_lpips(a, a, weights_path=path)
    diff = calculate_lpips(a, b, weights_path=path)
    assert abs(same) < 1e-6
    assert diff > same and np.isfinite(diff)
    # loaded backbone actually in use: conv1 kernel matches the sd
    model, variables, loaded = __import__(
        "ssl_tpu.metrics.lpips_metric", fromlist=["_get_lpips"])._get_lpips(path)
    assert loaded
    np.testing.assert_allclose(
        np.asarray(variables["params"]["net"]["conv1"]["kernel"]),
        sd["features.0.weight"].numpy().transpose(2, 3, 1, 0))


def test_dists_weight_loading(tmp_path):
    """Synthetic torchvision-vgg16 + alpha/beta checkpoint -> working DISTS."""
    import torch
    from ssl_tpu.metrics.dists_metric import calculate_dists, _CACHE, _VGG16_STAGES
    rng = np.random.RandomState(0)
    sd = {}
    cin = 3
    idx = 0
    for feats, n_convs in _VGG16_STAGES:
        for _ in range(n_convs):
            sd[f"features.{idx}.weight"] = torch.from_numpy(
                rng.randn(feats, cin, 3, 3).astype(np.float32) * 0.05)
            sd[f"features.{idx}.bias"] = torch.zeros(feats)
            cin = feats
            idx += 2
        idx += 1  # pool
    total_c = 3 + sum(c for c, _ in _VGG16_STAGES)
    sd["alpha"] = torch.from_numpy(np.abs(rng.randn(1, total_c, 1, 1)).astype(np.float32))
    sd["beta"] = torch.from_numpy(np.abs(rng.randn(1, total_c, 1, 1)).astype(np.float32))
    path = str(tmp_path / "dists.pt")
    torch.save(sd, path)

    _CACHE.clear()
    a = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    b = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    same = calculate_dists(a, a, weights_path=path)
    diff = calculate_dists(a, b, weights_path=path)
    assert abs(same) < 1e-4
    assert diff > same and np.isfinite(diff)
