"""Oracle-parity for the KAIR SSIMLoss (train_BSGRAN/models/loss_ssim.py,
reachable via G_lossfn_type: "ssim" — VERDICT r2 missing #6)."""

import importlib.util
import sys
from os import path as osp

import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from ssl_tpu.losses import build_loss  # noqa: E402
from ssl_tpu.utils.kair_options import kair_to_opt  # noqa: E402


def _load_ref_loss_ssim():
    spec = importlib.util.spec_from_file_location(
        "ref_loss_ssim",
        "/root/reference/GAN-Based-SR/train_BSGRAN/models/loss_ssim.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ssim_loss_matches_reference():
    ref = _load_ref_loss_ssim()
    rng = np.random.default_rng(0)
    a = rng.random((2, 3, 24, 20)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)
    want = ref.SSIMLoss()(torch.from_numpy(a), torch.from_numpy(b)).item()
    loss = build_loss({"type": "SSIMLoss", "loss_weight": 1.0})
    got = float(loss(jnp.asarray(a.transpose(0, 2, 3, 1)),
                     jnp.asarray(b.transpose(0, 2, 3, 1))))
    assert abs(want - got) < 1e-5


def test_kair_option_ssim_wiring():
    # G_lossfn_type "ssim" must resolve to SSIMLoss through the JSON options
    src = "/root/reference/GAN-Based-SR/train_BSGRAN/options/BSRGAN/train_BSRGANSSL_DF2K_OST_x4.json"
    import json
    import re
    with open(src) as f:
        txt = re.sub(r"//.*", "", f.read())
    d = json.loads(txt)
    d["train"]["G_lossfn_type"] = "ssim"
    opt = kair_to_opt(d)
    assert opt["train"]["pixel_opt"]["type"] == "SSIMLoss"
    assert build_loss(opt["train"]["pixel_opt"]) is not None
