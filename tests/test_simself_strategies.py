"""Oracle parity for the diffusion tree's FULL ``simself_strategy`` zoo.

Executes the reference's own ``similarity_map`` class
(Diffusion-Based-SR/basicsr/losses/loss_util.py) on CPU as the oracle for
every dispatch branch (:269-363) and asserts our jnp implementations
(ssl_tpu/losses/simself_strategies.py) elementwise-equal.

* pure-torch strategies run the reference verbatim (``.cuda()`` shimmed to a
  no-op — CPU tensors pass through);
* ``*_cuda_v*`` strategies get ``compute_similarity`` injected from OUR
  already-oracle-verified SSD primitive (ops/ssg.py; the GAN and diffusion
  trees ship bit-identical similarity.cu), so these tests pin the *epilogue*
  math exactly.
"""

from __future__ import annotations

import importlib.util
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ssl_tpu.losses import simself_strategies as S
from ssl_tpu.ops.ssg import SSGConfig, ssg_ssd_maps_scan
from tests.ref_loader import install_reference_stubs

pytestmark = pytest.mark.slow

REF_LOSS_UTIL = "/root/reference/Diffusion-Based-SR/basicsr/losses/loss_util.py"


def _compute_similarity_adapter(image, mask, psize=25, ksize=9):
    """Drop-in for the reference CUDA wrapper: (c,h,w) image + (h,w) mask ->
    (num, psize, psize) raw SSD maps, centers in torch.nonzero order."""
    img = jnp.asarray(image.detach().cpu().numpy(), jnp.float32)
    m = np.asarray(mask.detach().cpu().numpy())
    ys, xs = np.nonzero(m == 1)
    pos = jnp.asarray(np.stack([ys, xs], -1).astype(np.int32))
    cfg = SSGConfig(search=psize, window=ksize, sigma=1.0, generalization=False)
    ssd = np.asarray(ssg_ssd_maps_scan(img, cfg, pos))
    return torch.from_numpy(ssd.reshape(len(ys), psize, psize).astype(np.float32))


@pytest.fixture(scope="module")
def simmod():
    install_reference_stubs()
    spec = importlib.util.spec_from_file_location(
        "basicsr.losses.loss_util_diffusion", REF_LOSS_UTIL)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    mod.compute_similarity = _compute_similarity_adapter
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    yield mod
    torch.Tensor.cuda = orig_cuda


def _fixtures(seed=0, h=32, w=32, mask_channels=1):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (1, 3, h, w)).astype(np.float32)
    sr = rng.uniform(0, 1, (1, 3, h, w)).astype(np.float32)
    mask = (rng.uniform(size=(1, mask_channels, h, w)) < 0.15).astype(np.float32)
    # force one empty 16x16 grid patch to exercise the _patch skip logic
    mask[:, :, :16, :16] = 0.0
    mask[0, :, 20, 20] = 1.0  # and guarantee at least one center overall
    return img, sr, mask


def _run_ref(simmod, strat, img, mask=None, sr=None, **kw):
    r = simmod.similarity_map(
        img=torch.from_numpy(img), mask=None if mask is None else torch.from_numpy(mask),
        img_sr=None if sr is None else torch.from_numpy(sr),
        simself_strategy=strat, **kw)
    return r


def _run_ours(strat, img, mask=None, sr=None, **kw):
    return S.similarity_map(jnp.asarray(img),
                            mask=None if mask is None else jnp.asarray(mask),
                            img_sr=None if sr is None else jnp.asarray(sr),
                            simself_strategy=strat, **kw)


def _close(a, b, rtol=2e-4, atol=3e-5):
    np.testing.assert_allclose(np.asarray(a), b.detach().numpy(),
                               rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# dense tile strategies
# ---------------------------------------------------------------------------

DENSE_CASES = [
    ("imgimg", dict(dh=16, dw=16)),
    ("imgimg", dict(dh=16, dw=16, is_shift=True, shift_h=3, shift_w=5)),
    ("gradimg", dict(dh=16, dw=16, gray=False, threshold=2e-3)),
    ("gradimg", dict(dh=16, dw=16, gray=True, is_shift=True, shift_h=2, shift_w=2)),
    ("gradgrad", dict(dh=16, dw=16, gray=True)),
    ("areaarea", dict(dh=16, dw=16, kernel_size=5)),
    ("areaarea", dict(dh=16, dw=16, kernel_size=5, mean=True, temperature=0.7)),
    ("areaarea", dict(dh=16, dw=16, kernel_size=3, softmax=False,
                      rearrange_back=False)),
    ("areaarea", dict(dh=16, dw=16, kernel_size=3, crossentropy=True)),
    ("areaarea", dict(dh=16, dw=16, kernel_size=5, is_shift=True,
                      shift_h=4, shift_w=4)),
    ("areaarea_ori", dict(dh=16, dw=16, kernel_size=5, is_shift=True,
                          shift_h=4, shift_w=4)),
    ("areaarea_ori", dict(dh=16, dw=16, kernel_size=5, mean=True)),
    ("areaarea_nonlocal", dict(dh=16, dw=16, kernel_size=3, scaling_factor=2)),
    ("areaarea_nonlocal_slow", dict(dh=16, dw=16, kernel_size=3, scaling_factor=2)),
    ("areaarea_cos", dict(dh=16, dw=16, kernel_size=5, temperature=0.5)),
    ("areaarea_stride", dict(dh=16, dw=16, kernel_size=5, stride=1)),
    ("areaarea_pad_roll", dict(dh=16, dw=16, kernel_size=5, shift_h=4, shift_w=4)),
    ("areaarea_gradfilter", dict(dh=16, dw=16, kernel_size=5, pix_num=1,
                                 temperature=0.5)),
]


@pytest.mark.parametrize("strat,kw", DENSE_CASES,
                         ids=[f"{s}-{i}" for i, (s, _) in enumerate(DENSE_CASES)])
def test_dense_strategy_parity(simmod, strat, kw):
    img, _, _ = _fixtures()
    ref = _run_ref(simmod, strat, img, **kw)
    ours = _run_ours(strat, img, **kw)
    _close(ours.s, ref.s)
    if strat == "areaarea_gradfilter":
        idx_ref = ref.index.squeeze(-1).numpy()
        np.testing.assert_array_equal(np.asarray(ours.index), idx_ref)


def test_stride2_method_parity(simmod):
    """stride>1 path (the class dispatch always passes stride=1; exercise the
    method directly like the reference's experiments would)."""
    img, _, _ = _fixtures()
    holder = simmod.similarity_map.__new__(simmod.similarity_map)
    holder.simself_areaarea_stride(img=torch.from_numpy(img), dh=16, dw=16,
                                   kernel_size=5, stride=2, temperature=0,
                                   softmax=True)
    ours = S.simself_areaarea_stride(jnp.asarray(img), dh=16, dw=16,
                                     kernel_size=5, stride=2, temperature=0,
                                     softmax=True)
    _close(ours.s, holder.s)


def test_module_level_helpers_parity(simmod):
    img, _, _ = _fixtures(seed=3)
    t = torch.from_numpy(img)
    _close(S.self_similarity(jnp.asarray(img), is_shift=True, shift_h=4,
                             shift_w=4, dh=16, dw=16),
           simmod.self_similarity(t, is_shift=True, shift_h=4, shift_w=4,
                                  dh=16, dw=16))
    _close(S.gradient_img_similarity(jnp.asarray(img), dh=16, dw=16,
                                     gray=True, threshold=1e-3),
           simmod.gradient_img_similarity(t, dh=16, dw=16, gray=True,
                                          threshold=1e-3))


# ---------------------------------------------------------------------------
# masked strategies (pure-torch semantics)
# ---------------------------------------------------------------------------

MASKED_CASES = [
    ("areaarea_mask_nonlocal", dict(kernel_size=7, kernel_size_center=3,
                                    scaling_factor=1.0, softmax=True)),
    ("areaarea_mask_nonlocal", dict(kernel_size=7, kernel_size_center=3,
                                    scaling_factor=0.5, softmax=False)),
    ("areaarea_mask_nonlocal_slow", dict(kernel_size=7, kernel_size_center=3,
                                         scaling_factor=1.0, softmax=True)),
    ("areaarea_mask_trans", dict(kernel_size=7, kernel_size_center=3,
                                 mean=False, softmax=True)),
    ("areaarea_mask_trans", dict(kernel_size=7, kernel_size_center=3,
                                 mean=True, var=True, softmax=False)),
    ("areaarea_mask_nonlocal_patch", dict(kernel_size=7, kernel_size_center=3,
                                          scaling_factor=1.0, softmax=True,
                                          dh=16, dw=16)),
    ("areaarea_mask_trans_patch", dict(kernel_size=7, kernel_size_center=3,
                                       mean=True, softmax=True, dh=16, dw=16)),
]


@pytest.mark.parametrize("strat,kw", MASKED_CASES,
                         ids=[f"{s}-{i}" for i, (s, _) in enumerate(MASKED_CASES)])
def test_masked_strategy_parity(simmod, strat, kw):
    img, _, mask = _fixtures(seed=1)
    ref = _run_ref(simmod, strat, img, mask=mask, **kw)
    ours = _run_ours(strat, img, mask=mask, **kw)
    _close(ours.s, ref.s)


def test_mutual_patch_parity(simmod):
    img, sr, mask = _fixtures(seed=2)
    kw = dict(kernel_size=7, kernel_size_center=3, scaling_factor=1.0,
              softmax=True, dh=16, dw=16)
    ref = _run_ref(simmod, "areaarea_mask_nonlocal_patch_mutual", img,
                   mask=mask, sr=sr, **kw)
    ours = _run_ours("areaarea_mask_nonlocal_patch_mutual", img, mask=mask,
                     sr=sr, **kw)
    _close(ours.s, ref.s)
    _close(ours.s1, ref.s1)


# ---------------------------------------------------------------------------
# CUDA-op epilogues (compute_similarity injected from ops/ssg)
# ---------------------------------------------------------------------------

CUDA_CASES = [
    ("areaarea_mask_nonlocal_cuda_v1", dict(softmax=True)),
    ("areaarea_mask_nonlocal_cuda_v1_patch", dict(softmax=True, dh=16, dw=16)),
    ("areaarea_mask_nonlocal_cuda_v2", dict(softmax=True)),
    ("areaarea_mask_nonlocalavg_cuda_v1", dict(softmax=True)),
    ("areaarea_mask_nonlocalavg_cuda_v2", dict(softmax=True)),
    ("areaarea_mask_eulardistanceavg_cuda_v1", dict(softmax=True)),
    ("areaarea_mask_nonlocalavg_cuda_v3", dict(softmax=True)),
    ("areaarea_mask_nonlocalavg_cuda_v1RGB", dict(softmax=True)),
    ("areaarea_mask_nonlocalavg_cuda_v5", dict(softmax=True, gene_type="sum",
                                               largest_k=5)),
    ("areaarea_mask_nonlocalavg_cuda_v5", dict(softmax=True,
                                               gene_type="softmax")),
]


@pytest.mark.parametrize("strat,kw", CUDA_CASES,
                         ids=[f"{s.split('cuda_')[-1]}-{i}"
                              for i, (s, _) in enumerate(CUDA_CASES)])
def test_cuda_epilogue_parity(simmod, strat, kw):
    nch = 3 if strat.endswith("v1RGB") else 1
    img, _, mask = _fixtures(seed=4, mask_channels=nch)
    base = dict(kernel_size=7, kernel_size_center=3, scaling_factor=1.0)
    base.update(kw)
    ref = _run_ref(simmod, strat, img, mask=mask, **base)
    ours = _run_ours(strat, img, mask=mask, **base)
    _close(ours.s, ref.s)


def test_cuda_v4_method_parity(simmod):
    """The reference DISPATCH passes an int kernel_size_center into v4's
    ``for k in kernel_size_center`` (TypeError there); the method itself wants
    a list — compare method-to-method."""
    img, _, mask = _fixtures(seed=5)
    holder = simmod.similarity_map.__new__(simmod.similarity_map)
    holder.simself_mask_nonlocalavg_cuda_v4(
        img=torch.from_numpy(img), mask=torch.from_numpy(mask),
        kernel_size_search=7, kernel_size_center=[3, 5], sigma=1.0,
        softmax=True)
    ours = _run_ours("areaarea_mask_nonlocalavg_cuda_v4", img, mask=mask,
                     kernel_size=7, kernel_size_center=[3, 5],
                     scaling_factor=1.0, softmax=True)
    _close(ours.s, holder.s)


def test_cuda_maxh_parity(simmod):
    img, sr, mask = _fixtures(seed=6)
    kw = dict(kernel_size=7, kernel_size_center=3, scaling_factor=1.0,
              softmax=True)
    ref = _run_ref(simmod, "areaarea_mask_nonlocalavg_cuda_maxh_v1", img,
                   mask=mask, sr=sr, **kw)
    ours = _run_ours("areaarea_mask_nonlocalavg_cuda_maxh_v1", img, mask=mask,
                     sr=sr, **kw)
    # max_h divides by a log of an SSD ratio — looser fp tolerance
    _close(ours.s, ref.s, rtol=1e-3, atol=1e-4)
    _close(ours.s1, ref.s1, rtol=1e-3, atol=1e-4)


def test_trainable_sigma_parity(simmod):
    img, sr, mask = _fixtures(seed=7)
    ref = simmod.trainable_similarity_map(scaling_factor=2.5)
    s_ref, s1_ref = ref(torch.from_numpy(img), torch.from_numpy(sr),
                        torch.from_numpy(mask), kernel_size_search=7,
                        kernel_size_center=3, softmax=True)
    ys, xs = np.nonzero(mask[0, 0] == 1)
    pos = jnp.asarray(np.stack([ys, xs], -1).astype(np.int32))
    s, s1 = S.trainable_sigma_rows(jnp.asarray(img[0]), jnp.asarray(sr[0]),
                                   pos, ks=7, kc=3, sigma=2.5, softmax=True)
    _close(s[None], s_ref)
    _close(s1[None], s1_ref)


def test_judge_abnormal_pixel_parity(simmod):
    img, sr, _ = _fixtures(seed=8)
    sr_ab_ref, gt_ab_ref, idx_norm_ref, idx_ab_ref = simmod.judge_abnormal_pixel(
        torch.from_numpy(sr), torch.from_numpy(img), kernel_size=3)
    sr_ab, gt_ab, normal, abnormal = S.judge_abnormal_pixel(
        jnp.asarray(sr), jnp.asarray(img), kernel_size=3)
    np.testing.assert_allclose(np.sort(np.asarray(sr_ab)),
                               np.sort(sr_ab_ref.numpy()), rtol=1e-6, atol=0)
    assert int(np.asarray(abnormal).sum()) == len(idx_ab_ref[0])


def _ref_issl(simmod, sr, gt, mask, strat, l1_w, kl_w, **kw):
    """The reference's issl composition (ddpmssl.py:439-513): per-image maps,
    skip empty masks, concat along dim=1, L1-mean + KLDistance
    (basic_loss.py:641-646: kl_div(clamp(x,1e-10).log(), clamp(y,1e-10)))."""
    softmax_sr = kw.pop("softmax_sr", False)
    softmax_gt = kw.pop("softmax_gt", False)
    srs, gts = [], []
    for i in range(sr.shape[0]):
        m = torch.from_numpy(mask[i:i + 1])
        if m.sum() == 0:
            continue
        srs.append(simmod.similarity_map(
            img=torch.from_numpy(sr[i:i + 1]), mask=m, simself_strategy=strat,
            softmax=softmax_sr, **kw).getitem())
        gts.append(simmod.similarity_map(
            img=torch.from_numpy(gt[i:i + 1]), mask=m, simself_strategy=strat,
            softmax=softmax_gt, **kw).getitem())
    s, g = torch.cat(srs, dim=1), torch.cat(gts, dim=1)
    l1 = l1_w * torch.mean(torch.abs(s - g))
    kl = kl_w * torch.nn.functional.kl_div(
        torch.clamp(s, min=1e-10).log(), torch.clamp(g, min=1e-10),
        reduction="mean")
    return float(l1), float(kl)


@pytest.mark.parametrize("strat,extra", [
    ("areaarea", dict(kernel_size=5, simself_dh=16, simself_dw=16,
                      softmax_sr=True, softmax_gt=True)),
    ("areaarea_mask_nonlocal", dict(kernel_size=7, kernel_size_center=3,
                                    scaling_factor=1.0, softmax_sr=True,
                                    softmax_gt=False)),
])
def test_strategy_loss_composition_parity(simmod, strat, extra):
    """simself_strategy_loss == the reference issl composition, including the
    skip of an empty-mask image and the capacity-padded validity weighting."""
    from ssl_tpu.losses.ssl_loss import SSLSetting

    rng = np.random.default_rng(11)
    b, h, w = 3, 32, 32
    sr = rng.uniform(0, 1, (b, 3, h, w)).astype(np.float32)
    gt = rng.uniform(0, 1, (b, 3, h, w)).astype(np.float32)
    mask = (rng.uniform(size=(b, 1, h, w)) < 0.1).astype(np.float32)
    mask[1] = 0.0                                     # reference skips image 1

    ref_kw = dict(dh=extra.get("simself_dh", 16), dw=extra.get("simself_dw", 16),
                  kernel_size=extra["kernel_size"],
                  scaling_factor=extra.get("scaling_factor", 4),
                  kernel_size_center=extra.get("kernel_size_center", 9),
                  softmax_sr=extra["softmax_sr"], softmax_gt=extra["softmax_gt"])
    l1_ref, kl_ref = _ref_issl(simmod, sr, gt, mask, strat,
                               l1_w=0.5, kl_w=0.25, **ref_kw)

    setting = SSLSetting(mask_stride=0, capacity=256, l1_weight=0.5,
                         kl_weight=0.25, strategy=strat,
                         strategy_opts=tuple(extra.items()))
    l1, kl = S.simself_strategy_loss(
        jnp.asarray(sr.transpose(0, 2, 3, 1)),
        jnp.asarray(gt.transpose(0, 2, 3, 1)),
        jnp.asarray(mask[:, 0]), setting)
    np.testing.assert_allclose(float(l1), l1_ref, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(kl), kl_ref, rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("strat", ["areaarea", "areaarea_mask_nonlocal",
                                   "areaarea_mask_nonlocal_patch",
                                   "areaarea_mask_nonlocal_cuda_v2"])
def test_strategy_loss_jit(strat):
    """The loss wrapper compiles and differentiates under jit (fixed-capacity
    masked rows, static per-image loop)."""
    import jax
    from ssl_tpu.losses.ssl_loss import SSLSetting

    rng = np.random.default_rng(13)
    sr = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(2, 32, 32)) < 0.1).astype(np.float32))
    setting = SSLSetting(mask_stride=0, capacity=128, l1_weight=1.0,
                         kl_weight=1.0, strategy=strat,
                         strategy_opts=(("kernel_size", 7),
                                        ("kernel_size_center", 3),
                                        ("scaling_factor", 1.0),
                                        ("simself_dh", 16), ("simself_dw", 16),
                                        ("softmax_sr", True),
                                        ("softmax_gt", True)))

    def f(s):
        l1, kl = S.simself_strategy_loss(s, gt, mask, setting)
        return l1 + kl

    val, grad = jax.jit(jax.value_and_grad(f))(sr)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()


def test_dead_branch_raises():
    img, _, mask = _fixtures()
    with pytest.raises(NotImplementedError):
        S.similarity_map(jnp.asarray(img), mask=jnp.asarray(mask),
                         simself_strategy="areaarea_mask_nonlocalavg_cuda_v1_p")
