"""Benchmark: ESRGAN-SSL training throughput on the real chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures imgs/sec/chip for the canonical ESRGAN-SSL step (RRDBNet-23 x4
generator, VGG-style relativistic GAN D, pixel L1 + SSG-L1 + SSG-KL at the
shipped hyper-parameters: gt 128^2, search 25, window 9 — BASELINE.md).
`vs_baseline` policy (honest-anchor, BASELINE.md §anchors): the reference
publishes no number and no GPU exists here to measure its CUDA path, so the
ratio is computed ONLY against a supplied `BASELINE_IMGS_PER_SEC` env (e.g.
a driver-measured A100 run); without it `vs_baseline` is null.  The one
reproducible in-repo comparison is the same-host CPU ratio from
scripts/bench_reference_cpu.py (reference's own torch code vs ours on
identical hardware/config), recorded in BASELINE.md."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_env_anchor = os.environ.get("BASELINE_IMGS_PER_SEC")
BASELINE_IMGS_PER_SEC = float(_env_anchor) if _env_anchor else None


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    # persistent XLA compile cache: repeat bench runs skip the big compiles
    from ssl_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    # matmul/conv precision: 'bfloat16' = single-pass MXU (fastest),
    # 'float32' = full fp32 via multi-pass. Training SR GANs is robust to
    # bf16 compute with fp32 params (weights/accumulators stay fp32).
    prec = os.environ.get("BENCH_MATMUL_PRECISION", "bfloat16")
    jax.config.update("jax_default_matmul_precision", prec)

    from ssl_tpu.models import build_model

    # batch 24 is this chip's measured throughput optimum (batch-scaling
    # table, BASELINE.md round 5: 16->180.9, 24->184.6, 32->172.8,
    # 48->156.9, 64->125.9); per-chip batch is a free parameter under DDP
    # semantics — global batch comes from chips x per-chip batch
    batch = int(os.environ.get("BENCH_BATCH", "24"))
    gt_size = int(os.environ.get("BENCH_GT_SIZE", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    scale = 4
    lq = gt_size // scale

    opt = {
        "name": "bench", "model_type": "ESRGANSSLModel", "scale": scale, "is_train": True,
        "manual_seed": 0,
        "datasets": {"train": {"gt_size": gt_size}},
        # remat 'none': trunk activations fit v5e HBM at this config and the
        # recompute-free backward is measured fastest (48.6 vs 54.3ms 'full')
        # bf16 G activations: the RRDB trunk is bandwidth-leaning (BASELINE.md
        # MFU table) — halving activation width fwd+saved-residuals is +13%
        # step; params/opt/EMA/output fp32 (test_g_bf16_deviation; convergence
        # A/B in STATUS §Perf)
        "network_g": {"type": "RRDBNet", "num_feat": 64, "num_block": 23, "num_grow_ch": 32,
                      "remat_policy": os.environ.get("BENCH_REMAT", "none"),
                      # full unroll: the scanned trunk's 23 iterations become
                      # straight-line code — XLA schedules across block
                      # boundaries (isolated G fwd+bwd 37.3->33.3 ms; step
                      # +3.1% at b24).  Exact math, identical param pytree;
                      # one-time compile cost only (cached).  Partial unroll
                      # (4) was measured SLOWER in round 3 — the win only
                      # appears when the loop disappears entirely.
                      "scan_unroll": int(os.environ.get("BENCH_UNROLL", "23")),
                      "compute_dtype": os.environ.get("BENCH_G_DTYPE", "bfloat16")},
        # bf16 D activations: the D bucket is bandwidth-bound (BASELINE.md MFU
        # table); params/SN iterates/logits stay fp32 (test_d_bf16_deviation)
        "network_d": {"type": "UNetDiscriminatorSN", "num_feat": 64,
                      "compute_dtype": os.environ.get("BENCH_D_DTYPE", "bfloat16")},
        "path": {},
        "ssl_setting": {"mask_stride": 3, "kernel_size_search": 25, "sigma": 0.004,
                        "kernel_size_window": 9, "generalization": True,
                        # bf16 q-stack halves the SSL term's HBM streaming —
                        # precision contract pinned by test_stored_bf16_deviation
                        # (consistent with the bf16 MXU smap matmuls above)
                        "q_store_dtype": os.environ.get("BENCH_SSG_STORE_DTYPE",
                                                        "bfloat16"),
                        # bf16 padded-image streams: halves the 625-offset
                        # sweeps' dominant HBM traffic (test_stream_bf16_deviation)
                        "stream_dtype": os.environ.get("BENCH_SSG_STREAM_DTYPE",
                                                       "bfloat16"),
                        # offset pairing (DESIGN_SSG §10): one SSD map +
                        # paired streams per (+d,-d) mirror pair — exact;
                        # knob for on-chip A/B vs the unpaired sweeps
                        "pair_offsets": os.environ.get("BENCH_SSG_PAIR", "1") == "1",
                        "impl": os.environ.get("BENCH_SSL_IMPL", "dense"),
                        "capacity": int(os.environ.get("BENCH_SSL_CAP", str(gt_size * gt_size // 4)))},
        "train": {
            "ema_decay": 0.999,
            "optim_g": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
            "optim_d": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [50000], "gamma": 0.5},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1e-2},
            "selfsim_opt": {"type": "L1Loss", "loss_weight": 1e3},
            "selfsim1_opt": {"type": "KLDistanceLoss", "loss_weight": 1e3, "softmax": False},
            # VGG compute_dtype: measured-and-REJECTED as a default — on-chip
            # A/B 182.3 fp32 vs 181.9 bf16 (round 4): the VGG bucket is
            # compute-dense (~53% in-bucket MFU, BASELINE.md) and its matmuls
            # already run bf16 on the MXU, so halving activation width buys
            # nothing and the tap casts add work. Knob + precision contract
            # (test_vgg_bf16_deviation) kept for bandwidth-starved configs.
            "perceptual_opt": {"type": "PerceptualLoss", "layer_weights": {"conv5_4": 1.0},
                               "perceptual_weight": 1.0, "style_weight": 0, "criterion": "l1",
                               "compute_dtype": os.environ.get("BENCH_VGG_DTYPE", "float32")},
            "gan_opt": {"type": "GANLoss", "gan_type": "vanilla", "loss_weight": 5e-3},
        },
    }

    model = build_model(opt)
    state = model.init_state(lq_shape=(batch, lq, lq, 3))

    rng = np.random.RandomState(0)
    batch_data = {
        "lq": jnp.asarray(rng.rand(batch, lq, lq, 3), jnp.float32),
        "gt": jnp.asarray(rng.rand(batch, gt_size, gt_size, 3), jnp.float32),
        "gt_mask": jnp.asarray(rng.rand(batch, gt_size, gt_size, 1) < 0.25, jnp.float32),
    }

    # compile + warmup (2 post-compile steps settle the device clock/queues)
    for _ in range(3):
        state, logs = model.train_step(state, batch_data)
        jax.block_until_ready(state)

    # median of N timed windows: the tunneled device adds occasional external
    # latency spikes; the median is spike-resistant without the upward bias a
    # max-of-windows headline would have vs mean/median-measured anchors
    # (ADVICE r3).  Per-window list printed for auditability.
    windows = []
    for _ in range(max(1, int(os.environ.get("BENCH_WINDOWS", "3")))):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, logs = model.train_step(state, batch_data)
        jax.block_until_ready(state)
        windows.append(batch * steps / (time.perf_counter() - t0))

    imgs_per_sec = float(np.median(windows))
    print(json.dumps({
        "metric": "esrgan_ssl_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/s",
        "vs_baseline": (round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3)
                        if BASELINE_IMGS_PER_SEC else None),
        "windows": [round(w, 1) for w in windows],
    }))


if __name__ == "__main__":
    main()
