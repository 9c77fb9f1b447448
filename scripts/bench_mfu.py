"""FLOPs / MFU accounting for the ESRGAN-SSL train step (VERDICT r3 #1).

Uses XLA's own compiled cost model (``compiled.cost_analysis()``) for the
FLOPs and bytes of the full jitted step and of ablated variants, and the
measured steady-state step time for the achieved TFLOP/s.  Component FLOPs
are attributed by ablation differences (same protocol as
bench_step_ablation.py's ms attribution).

MFU reference points (TPU v5e, per chip): 197 TFLOP/s bf16 MXU peak,
819 GB/s HBM bandwidth.
"""
import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from ssl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
jax.config.update("jax_default_matmul_precision",
                  os.environ.get("BENCH_MATMUL_PRECISION", "bfloat16"))
from ssl_tpu.models import build_model

V5E_PEAK_BF16 = 197e12     # FLOP/s
V5E_HBM_BW = 819e9         # B/s

batch = int(os.environ.get("BENCH_BATCH", "16"))
gt_size = int(os.environ.get("BENCH_GT_SIZE", "128"))
steps = int(os.environ.get("BENCH_STEPS", "10"))
scale = 4
lq = gt_size // scale

base_opt = {
    "name": "bench", "model_type": "ESRGANSSLModel", "scale": scale, "is_train": True,
    "manual_seed": 0,
    "datasets": {"train": {"gt_size": gt_size}},
    "network_g": {"type": "RRDBNet", "num_feat": 64, "num_block": 23, "num_grow_ch": 32,
                  "remat_policy": "none",
                  "compute_dtype": os.environ.get("BENCH_G_DTYPE", "bfloat16")},
    "network_d": {"type": "UNetDiscriminatorSN", "num_feat": 64,
                  "compute_dtype": os.environ.get("BENCH_D_DTYPE", "bfloat16")},
    "path": {},
    "ssl_setting": {"mask_stride": 3, "kernel_size_search": 25, "sigma": 0.004,
                    "kernel_size_window": 9, "generalization": True,
                    "q_store_dtype": "bfloat16", "stream_dtype": "bfloat16",
                    "pair_offsets": True, "impl": "dense",
                    "capacity": gt_size * gt_size // 4},
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


VARIANTS = {
    "full": [],
    "no_ssl": ["selfsim_opt", "selfsim1_opt"],
    "no_perceptual": ["perceptual_opt"],
    "no_d": ["network_d"],
}


def _build(tag):
    opt = copy.deepcopy(base_opt)
    for k in VARIANTS[tag]:
        if k == "network_d":
            opt.pop("network_d", None)
            opt["train"].pop("gan_opt", None)
            opt["train"].pop("optim_d", None)
        else:
            opt["train"].pop(k, None)
    model = build_model(opt)
    state = model.init_state(lq_shape=(batch, lq, lq, 3))
    return model, state


def flops_mode():
    """Print {tag: {flops, bytes}} from the lowered HLO cost model.  Run
    under JAX_PLATFORMS=cpu: logical FLOPs are backend-independent, the TPU
    (axon) backend returns None from cost_analysis(), and lowering needs no
    backend compile (the remote compiler takes minutes per fresh program)."""
    out = {}
    for tag in VARIANTS:
        model, state = _build(tag)
        ca = jax.jit(model.make_train_step()).lower(state, data).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out[tag] = {"flops": float(ca.get("flops", float("nan"))),
                    "bytes": float(ca.get("bytes accessed", float("nan")))}
    print(json.dumps(out))


if os.environ.get("BENCH_MFU_MODE") == "flops":
    flops_mode()
    sys.exit(0)

# FLOPs via a CPU subprocess of this same script
import subprocess

env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_MFU_MODE="flops",
           XLA_FLAGS="--xla_force_host_platform_device_count=1")
proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                      capture_output=True, text=True, env=env, timeout=3600)
costs = json.loads([ln for ln in proc.stdout.strip().splitlines()
                    if ln.startswith("{")][-1])


def measure(tag):
    model, state = _build(tag)
    s = state
    for _ in range(3):
        s, _ = model.train_step(s, data)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(steps):
        s, _ = model.train_step(s, data)
    jax.block_until_ready(s)
    ms = (time.perf_counter() - t0) / steps * 1000
    return {"tag": tag, "ms": ms, **costs[tag]}


rows = [measure(tag) for tag in VARIANTS]

full = rows[0]
print(f"\nconfig: ESRGAN-SSL b{batch} gt{gt_size}  "
      f"(matmul {jax.config.jax_default_matmul_precision})")
print(f"{'variant':16s} {'ms/step':>8s} {'imgs/s':>7s} {'GFLOP/step':>11s} "
      f"{'TFLOP/s':>8s} {'MFU%':>6s} {'GB/step':>8s} {'HBM%':>6s}")
for r in rows:
    tf = r["flops"] / (r["ms"] / 1e3)
    print(f"{r['tag']:16s} {r['ms']:8.1f} {batch / r['ms'] * 1e3:7.1f} "
          f"{r['flops'] / 1e9:11.1f} {tf / 1e12:8.1f} "
          f"{tf / V5E_PEAK_BF16 * 100:6.1f} {r['bytes'] / 1e9:8.2f} "
          f"{r['bytes'] / (r['ms'] / 1e3) / V5E_HBM_BW * 100:6.1f}")

print("\ncomponent attribution (full minus ablated):")
for r in rows[1:]:
    name = {"no_ssl": "SSL term", "no_perceptual": "VGG perceptual",
            "no_d": "D phases (+G-phase D fwd/grad)"}[r["tag"]]
    print(f"  {name:32s} {full['ms'] - r['ms']:6.1f} ms  "
          f"{(full['flops'] - r['flops']) / 1e9:8.1f} GFLOP")

print(json.dumps({
    "metric": "esrgan_ssl_step_mfu_pct",
    "value": round(full["flops"] / (full["ms"] / 1e3) / V5E_PEAK_BF16 * 100, 2),
    "unit": "%", "flops_per_step": full["flops"], "ms_per_step": round(full["ms"], 2),
}))
