"""Oracle-parity for BebyGAN's BBL + back-projection resize semantics.

Executes the reference's OWN BBL class and differentiable imresize
(bebyganssl_model.py:375-565) from /root/reference on CPU torch and asserts
elementwise equality of SR patches, selected buddy patches, loss values, and
the resize primitives themselves (VERDICT r2 missing #2)."""

import sys
from os import path as osp

import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from ref_loader import ref_module  # noqa: E402

from ssl_tpu.losses.bbl import back_projection_loss, best_buddy_pairs  # noqa: E402
from ssl_tpu.ops.torch_resize import bebygan_imresize_down, interp_bicubic  # noqa: E402

pytestmark = pytest.mark.slow


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


@pytest.mark.parametrize("size,out_scale", [((24, 36), 0.5), ((24, 36), 0.25),
                                            ((17, 23), 0.5), ((12, 12), 2.0)])
def test_interp_bicubic_matches_torch(size, out_scale):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *size, 3)).astype(np.float32)
    oh, ow = int(size[0] * out_scale), int(size[1] * out_scale)
    ref = torch.nn.functional.interpolate(
        _nchw(x), size=(oh, ow), mode="bicubic", align_corners=False)
    ours = interp_bicubic(jnp.asarray(x), (oh, ow))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("factor", [2, 3, 4])
def test_bebygan_imresize_down_matches_reference(factor):
    ref = ref_module("basicsr.models.bebyganssl_model")
    rng = np.random.default_rng(1)
    x = rng.random((2, 8 * factor, 12 * factor, 3)).astype(np.float32)
    want = ref.imresize(_nchw(x), scale=1.0 / factor)
    got = bebygan_imresize_down(jnp.asarray(x), factor)
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-5)


def test_bbl_pairs_and_loss_match_reference():
    ref = ref_module("basicsr.models.bebyganssl_model")
    bbl = ref.BBL()  # alpha=1, beta=1, ksize=3, pad=0, stride=3, l2
    rng = np.random.default_rng(2)
    # 48x48: patch grids at scales 1/0.5/0.25 all non-trivial
    sr = rng.random((2, 48, 48, 3)).astype(np.float32)
    gt = rng.random((2, 48, 48, 3)).astype(np.float32)
    p1_ref, sel_ref = bbl.forward(_nchw(sr), _nchw(gt))
    p1, sel = best_buddy_pairs(jnp.asarray(sr), jnp.asarray(gt))
    # elementwise patch equality pins the unfold ordering (c-major, kh, kw)
    np.testing.assert_allclose(np.asarray(p1), p1_ref.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sel), sel_ref.numpy(), rtol=1e-5, atol=1e-5)
    l_ref = (p1_ref - sel_ref).abs().mean().item()
    l_ours = float(jnp.mean(jnp.abs(p1 - sel)))
    assert abs(l_ref - l_ours) < 1e-6


def test_back_projection_loss_matches_reference():
    ref = ref_module("basicsr.models.bebyganssl_model")
    rng = np.random.default_rng(3)
    sr = rng.random((1, 64, 64, 3)).astype(np.float32)
    lq = rng.random((1, 16, 16, 3)).astype(np.float32)
    bp_ref = ref.imresize(_nchw(sr), scale=0.25)
    l_ref = (bp_ref - _nchw(lq)).abs().mean().item()
    l_ours = float(back_projection_loss(jnp.asarray(sr), jnp.asarray(lq)))
    assert abs(l_ref - l_ours) < 1e-6
