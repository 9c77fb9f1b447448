"""KAIR JSON adapter: parse a reference-style JSON and build a model from it."""
import pytest
import json
import os

import numpy as np
import jax.numpy as jnp

pytestmark = pytest.mark.slow


KAIR_JSON = """{
  "task": "BSRGANSSL_test" // comment
  , "model": "SSL"
  , "scale": 4
  , "path": {"root": "experiments", "pretrained_netG": null}
  , "datasets": {
    "train": {
      "name": "train_dataset", "dataset_type": "blindsrmask",
      "dataroot_H": "/tmp/H", "dataroot_H_mask": "/tmp/M",
      "H_size": 64, "lq_patchsize": 16,
      "dataloader_batch_size": 2, "dataloader_num_workers": 1
    },
    "test": {"name": "t", "dataset_type": "sr", "dataroot_H": "/tmp/H", "dataroot_L": "/tmp/L"}
  }
  , "netG": {"net_type": "rrdbnet", "in_nc": 3, "out_nc": 3, "nf": 8, "nb": 1, "gc": 4}
  , "netD": {"net_type": "discriminator_unet", "base_nc": 4}
  , "train": {
    "G_lossfn_type": "l1", "G_lossfn_weight": 1,
    "gan_type": "lsgan", "D_lossfn_weight": 1,
    "E_decay": 0.999, "G_optimizer_lr": 1e-4, "D_optimizer_lr": 1e-4,
    "G_scheduler_milestones": [40000], "G_scheduler_gamma": 0.5,
    "iterations": 100, "mask_stride": 3,
    "SSL_loss_weight": 500, "ssl_mode": "cuda",
    "kernel_size_search": 9, "sigma": 0.004, "generalization": true,
    "kernel_size_window": 5, "SSL1_loss_weight": 500
  }
}"""


def test_kair_json_to_model(tmp_path):
    path = str(tmp_path / "opt.json")
    with open(path, "w") as f:
        f.write(KAIR_JSON)
    from ssl_tpu.utils.options import parse_json_options
    from ssl_tpu.utils.kair_options import is_kair_options, kair_to_opt
    raw = parse_json_options(path)
    assert is_kair_options(raw)
    opt = kair_to_opt(raw)
    assert opt["model_type"] == "BSRGANSSLModel"
    assert opt["network_g"]["type"] == "BSRGANRRDBNet"
    assert opt["train"]["gan_opt"]["gan_type"] == "lsgan"
    assert opt["train"]["mask_stride"] == 3  # genuinely applied in KAIR tree
    assert opt["train"]["selfsim_opt"]["loss_weight"] == 500

    from ssl_tpu.models import build_model
    opt["is_train"] = True
    opt["path"] = {}
    model = build_model(opt)
    # stride genuinely on (KAIR behavior)
    assert model.ssl_setting.mask_stride == 3
    state = model.init_state(lq_shape=(1, 8, 8, 3))
    rng = np.random.RandomState(0)
    batch = {"lq": jnp.asarray(rng.rand(1, 8, 8, 3), jnp.float32),
             "gt": jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32),
             "gt_mask": jnp.asarray(rng.rand(1, 32, 32, 1) < 0.3, jnp.float32)}
    state, logs = model.train_step(state, batch)
    assert np.isfinite(float(logs["l_selfsim"]))


def test_kair_gan_and_plain_model_keys(tmp_path):
    """KAIR's non-SSL entry points (main_train_gan.py / main_train_psnr.py)
    use "model": "gan" / "plain" — the adapter maps them to the SRGAN / SR
    recipes and a step runs."""
    for key, expect in (("gan", "SRGANModel"), ("plain", "SRModel")):
        path = str(tmp_path / f"opt_{key}.json")
        with open(path, "w") as f:
            f.write(KAIR_JSON.replace('"model": "SSL"', f'"model": "{key}"'))
        from ssl_tpu.utils.options import parse_json_options
        from ssl_tpu.utils.kair_options import kair_to_opt
        opt = kair_to_opt(parse_json_options(path))
        assert opt["model_type"] == expect
        from ssl_tpu.models import build_model
        opt["is_train"] = True
        opt["path"] = {}
        model = build_model(opt)
        state = model.init_state(lq_shape=(1, 8, 8, 3))
        rng = np.random.RandomState(0)
        batch = {"lq": jnp.asarray(rng.rand(1, 8, 8, 3), jnp.float32),
                 "gt": jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)}
        state, logs = model.train_step(state, batch)
        assert int(state.step) == 1 and np.isfinite(float(logs["l_g_total"]
                                                          if "l_g_total" in logs
                                                          else logs["l_pix"]))
