"""StableSR-SSL diffusion train-step profile (VERDICT r3 #6).

Component table for the full jitted step (VAE encode -> q_sample -> dual-cond
UNet -> remat'd differentiable decode -> pixel/SSL losses -> Adam), with
FLOPs/bytes from XLA's compiled cost model (lowered on CPU — logical FLOPs
are backend-independent; the axon backend returns None) and times measured on
the real chip.  Attribution by ablation, same protocol as bench_mfu.py:

  full        eps + pixel + SSL on the remat-decoded x0 (shipped recipe,
              configs/SSL/base.yaml:140-203 semantics)
  no_ssl      pixel on, SSL off   -> diff = SSL term (SSG fwd+bwd)
  eps_only    pixel 0, SSL off    -> the decode is skipped entirely
              (ddpm_ssl.py:287-296), so full-minus-this = decode+pixel+SSL

Flash-attention A/B: BENCH_FLASH_ATTN=1 swaps every attention in the UNet /
struct-cond / VAE for the Pallas fused kernel (ops/attention.py).

Env: BENCH_BATCH (2), BENCH_SZ (256 | 512 for SD-prod image size),
BENCH_STEPS (10), BENCH_FLASH_ATTN (0/1), BENCH_DTYPE (''|bfloat16 —
activation compute_dtype on UNet/struct-cond/VAE, params fp32),
BENCH_MFU_MODE=flops (internal).
"""
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

V5E_PEAK_BF16 = 197e12
V5E_HBM_BW = 819e9

b = int(os.environ.get("BENCH_BATCH", "2"))
sz = int(os.environ.get("BENCH_SZ", "256"))
steps = int(os.environ.get("BENCH_STEPS", "10"))
flash = os.environ.get("BENCH_FLASH_ATTN", "0") == "1"
cdt = os.environ.get("BENCH_DTYPE") or None
# BENCH_DECODER_REMAT=0 reverts to the whole-decoder jax.checkpoint (the
# pre-round-4 scheme) for A/B attribution of vae.remat_decoder_blocks.
dec_remat = os.environ.get("BENCH_DECODER_REMAT", "1") == "1"
# BENCH_REMAT_SKIP=k exempts the k lowest-resolution decoder stages from
# remat (vae.Decoder.remat_skip_lowres) — replay-FLOP vs memory trade.
remat_skip = int(os.environ.get("BENCH_REMAT_SKIP", "0"))
# BENCH_SKIP_FLOPS=1 skips the CPU cost-model subprocess (slow on this
# 1-core host) — time-only rows, FLOPs columns NaN.
skip_flops = os.environ.get("BENCH_SKIP_FLOPS", "0") == "1"

# BENCH_VARIANTS=full runs just one leg (A/B knob runs skip the ablation)
VARIANTS = tuple(os.environ.get("BENCH_VARIANTS", "full,no_ssl,eps_only").split(","))


def _build(tag):
    from ssl_tpu.diffusion.ddpm_ssl import DiffusionSSLConfig, StableSRSSL
    from ssl_tpu.diffusion.unet import UNetModelDualcondV2, EncoderUNetModelWT
    from ssl_tpu.diffusion.vae import AutoencoderKL
    from ssl_tpu.losses.ssl_loss import SSLSetting
    from ssl_tpu.ops.ssg import SSGConfig

    ssl_on = tag == "full"
    cfg = DiffusionSSLConfig(timesteps=1000, context_dim=1024, context_len=77,
                             pixel_weight=0.0 if tag == "eps_only" else 0.1)
    model = StableSRSSL(
        cfg,
        unet=UNetModelDualcondV2(model_channels=128, channel_mult=(1, 2, 4, 4),
                                 num_heads=8, context_dim=1024,
                                 attention_resolutions=(4, 2, 1),
                                 use_flash_attention=flash, compute_dtype=cdt),
        structcond=EncoderUNetModelWT(model_channels=128, channel_mult=(1, 2, 4, 4),
                                      use_flash_attention=flash, compute_dtype=cdt),
        vae=AutoencoderKL(ch=128, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                          embed_dim=4, use_flash_attention=flash,
                          remat_decoder_blocks=dec_remat,
                          remat_skip_lowres=remat_skip, compute_dtype=cdt),
        ssl_setting=SSLSetting(
            ssg=SSGConfig(q_store_dtype="bfloat16", stream_dtype="bfloat16"),
            mask_stride=3, capacity=(sz // 4) ** 2, impl="dense",
            l1_weight=0.5 if ssl_on else 0.0,
            kl_weight=0.5 if ssl_on else 0.0),
        lr=1e-4)
    state = model.init_state(gt_shape=(b, sz, sz, 3))
    return model, state


def _batch(tag):
    rng = np.random.RandomState(0)
    data = {
        "gt": jnp.asarray(rng.rand(b, sz, sz, 3), jnp.float32),
        "lq": jnp.asarray(rng.rand(b, sz, sz, 3), jnp.float32),
    }
    if tag == "full":
        data["gt_mask"] = jnp.asarray(rng.rand(b, sz, sz, 1) < 0.25, jnp.float32)
    return data


def flops_mode():
    out = {}
    for tag in VARIANTS:
        model, state = _build(tag)
        ca = jax.jit(model.make_train_step()).lower(state, _batch(tag)).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out[tag] = {"flops": float(ca.get("flops", float("nan"))),
                    "bytes": float(ca.get("bytes accessed", float("nan")))}
    print(json.dumps(out))


if os.environ.get("BENCH_MFU_MODE") == "flops":
    flops_mode()
    sys.exit(0)

if skip_flops:
    costs = {t: {"flops": float("nan"), "bytes": float("nan")} for t in VARIANTS}
elif os.environ.get("BENCH_COSTS_JSON"):
    # precomputed cost-model output (the flops_mode JSON line) — the model is
    # backend-independent, so a CPU-precomputed file saves the ~10-min 1-core
    # lowering subprocess during chip sessions
    with open(os.environ["BENCH_COSTS_JSON"]) as f:
        costs = json.load(f)
else:
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_MFU_MODE="flops",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                          capture_output=True, text=True, env=env, timeout=3600)
    costs = json.loads([ln for ln in proc.stdout.strip().splitlines()
                        if ln.startswith("{")][-1])


def measure(tag):
    model, state = _build(tag)
    data = _batch(tag)
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

print(f"\nconfig: StableSR-SSL b{b} {sz}^2 flash_attn={int(flash)} "
      f"dtype={cdt or 'float32'} "
      f"(matmul {jax.config.jax_default_matmul_precision})")
print(f"{'variant':10s} {'ms/step':>8s} {'imgs/s':>7s} {'GFLOP/step':>11s} "
      f"{'TFLOP/s':>8s} {'MFU%':>6s} {'GB/step':>8s}")
for r in rows:
    tf = r["flops"] / (r["ms"] / 1e3)
    print(f"{r['tag']:10s} {r['ms']:8.1f} {b / r['ms'] * 1e3:7.1f} "
          f"{r['flops'] / 1e9:11.1f} {tf / 1e12:8.1f} "
          f"{tf / V5E_PEAK_BF16 * 100:6.1f} {r['bytes'] / 1e9:8.2f}")

if len(rows) == 3:
    no_ssl, eps = rows[1], rows[2]
    print("\ncomponent attribution:")
    print(f"  SSL term (SSG fwd+bwd)           {full['ms'] - no_ssl['ms']:6.1f} ms  "
          f"{(full['flops'] - no_ssl['flops']) / 1e9:8.1f} GFLOP")
    print(f"  remat'd VAE decode + pixel L1    {no_ssl['ms'] - eps['ms']:6.1f} ms  "
          f"{(no_ssl['flops'] - eps['flops']) / 1e9:8.1f} GFLOP")
    print(f"  eps core (enc+UNet+structcond+opt) {eps['ms']:4.1f} ms  "
          f"{eps['flops'] / 1e9:8.1f} GFLOP")

print(json.dumps({
    "metric": "stablesr_ssl_step_mfu_pct", "sz": sz, "flash_attn": int(flash),
    "decoder_remat": int(dec_remat), "compute_dtype": cdt or "float32",
    "value": None if skip_flops else
    round(full["flops"] / (full["ms"] / 1e3) / V5E_PEAK_BF16 * 100, 2),
    "unit": "%", "flops_per_step": None if skip_flops else full["flops"],
    "ms_per_step": round(full["ms"], 2),
    "imgs_per_sec": round(b / full["ms"] * 1e3, 2),
}))
