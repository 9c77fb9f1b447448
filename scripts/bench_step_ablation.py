"""ESRGAN-SSL step-time attribution: re-times the full bench step with
individual loss terms ablated (SSL / perceptual).  Source of the in-step
breakdown recorded in STATUS.md §Perf."""
import os, sys, time, copy
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from ssl_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
jax.config.update("jax_default_matmul_precision", "bfloat16")
from ssl_tpu.models import build_model

batch, gt_size, scale, steps = 16, 128, 4, 8
lq = gt_size // scale
base_opt = {
    "name": "bench", "model_type": "ESRGANSSLModel", "scale": scale, "is_train": True,
    "manual_seed": 0,
    "datasets": {"train": {"gt_size": gt_size}},
    "network_g": {"type": "RRDBNet", "num_feat": 64, "num_block": 23, "num_grow_ch": 32,
                  "remat_policy": "none"},
    "network_d": {"type": "UNetDiscriminatorSN", "num_feat": 64},
    "path": {},
    "ssl_setting": {"mask_stride": 3, "kernel_size_search": 25, "sigma": 0.004,
                    "kernel_size_window": 9, "generalization": True,
                    "q_store_dtype": "bfloat16", "stream_dtype": "bfloat16",
                    "impl": "dense", "capacity": gt_size * gt_size // 4},
    "train": {
        "ema_decay": 0.999,
        "optim_g": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
        "optim_d": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
        "scheduler": {"type": "MultiStepLR", "milestones": [50000], "gamma": 0.5},
        "pixel_opt": {"type": "L1Loss", "loss_weight": 1e-2},
        "selfsim_opt": {"type": "L1Loss", "loss_weight": 1e3},
        "selfsim1_opt": {"type": "KLDistanceLoss", "loss_weight": 1e3, "softmax": False},
        "perceptual_opt": {"type": "PerceptualLoss", "layer_weights": {"conv5_4": 1.0},
                           "perceptual_weight": 1.0, "style_weight": 0, "criterion": "l1"},
        "gan_opt": {"type": "GANLoss", "gan_type": "vanilla", "loss_weight": 5e-3},
    },
}
rng = np.random.RandomState(0)
data = {
    "lq": jnp.asarray(rng.rand(batch, lq, lq, 3), jnp.float32),
    "gt": jnp.asarray(rng.rand(batch, gt_size, gt_size, 3), jnp.float32),
    "gt_mask": jnp.asarray(rng.rand(batch, gt_size, gt_size, 1) < 0.25, jnp.float32),
}
def run(tag, drop, ssl_overrides=None):
    opt = copy.deepcopy(base_opt)
    for k in drop:
        if k == "network_d":
            opt.pop("network_d", None)
            opt["train"].pop("gan_opt", None)
            opt["train"].pop("optim_d", None)
        else:
            opt["train"].pop(k, None)
    if ssl_overrides:
        opt["ssl_setting"].update(ssl_overrides)
    model = build_model(opt)
    state = model.init_state(lq_shape=(batch, lq, lq, 3))
    state, _ = model.train_step(state, data); jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, _ = model.train_step(state, data)
    jax.block_until_ready(state)
    ms = (time.perf_counter() - t0) / steps * 1000
    print(f"{tag:30s}: {ms:6.1f} ms/step  {batch/ms*1000:6.1f} imgs/s", flush=True)
run("full", [])
run("no perceptual", ["perceptual_opt"])
run("no ssl", ["selfsim_opt", "selfsim1_opt"])
run("no gan (D dropped)", ["network_d"])
run("ssl pair_offsets off", [], {"pair_offsets": False})
