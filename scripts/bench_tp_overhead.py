"""Tensor-parallel overhead note (VERDICT r3 #6): relative step-time of the
StableSR-SSL train step under dp-only vs dp x tp layouts on the virtual
8-device CPU mesh.

No multi-chip hardware exists in this sandbox, so absolute times are
meaningless — but the RATIO dp8 : dp4xtp2 : dp2xtp4 at identical global
batch is a valid relative signal of the Megatron-style sharding's collective
+ imbalance overhead (the same XLA SPMD partitioner and collective schedule
run on real ICI).  Run:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python scripts/bench_tp_overhead.py
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

b = int(os.environ.get("BENCH_BATCH", "8"))
sz = int(os.environ.get("BENCH_SZ", "64"))
steps = int(os.environ.get("BENCH_STEPS", "5"))
ch = int(os.environ.get("BENCH_CH", "64"))


def build(mesh):
    from ssl_tpu.diffusion import (AutoencoderKL, DiffusionSSLConfig,
                                   EncoderUNetModelWT, StableSRSSL,
                                   UNetModelDualcondV2)
    from ssl_tpu.losses.ssl_loss import SSLSetting
    from ssl_tpu.ops.ssg import SSGConfig
    cfg = DiffusionSSLConfig(timesteps=100, context_dim=64, context_len=8)
    return StableSRSSL(
        cfg,
        unet=UNetModelDualcondV2(model_channels=ch, channel_mult=(1, 2),
                                 num_head_channels=8, context_dim=64,
                                 attention_resolutions=(2,)),
        structcond=EncoderUNetModelWT(model_channels=ch, channel_mult=(1, 2)),
        vae=AutoencoderKL(ch=32, ch_mult=(1, 2, 2, 2), num_res_blocks=1,
                          embed_dim=4),
        ssl_setting=SSLSetting(ssg=SSGConfig(search=9, window=5),
                               mask_stride=3, capacity=(sz // 4) ** 2,
                               l1_weight=0.5, kl_weight=0.5),
        lr=1e-4, mesh=mesh)


def run(name, dp, tp):
    from ssl_tpu.parallel.tensor import (create_dp_tp_mesh, shard_batch_dp)
    mesh = create_dp_tp_mesh(dp, tp)
    model = build(mesh)
    state = model.place_state(model.init_state(gt_shape=(b, sz, sz, 3)))
    rng = np.random.RandomState(0)
    batch = shard_batch_dp({
        "gt": rng.rand(b, sz, sz, 3).astype(np.float32),
        "lq": rng.rand(b, sz, sz, 3).astype(np.float32),
        "gt_mask": (rng.rand(b, sz, sz, 1) < 0.2).astype(np.float32),
    }, mesh)
    state, _ = model.train_step(state, batch)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, _ = model.train_step(state, batch)
    jax.block_until_ready(state)
    ms = (time.perf_counter() - t0) / steps * 1000
    print(f"{name:10s} {ms:8.1f} ms/step")
    return ms


ms8 = run("dp8", 8, 1)
ms42 = run("dp4xtp2", 4, 2)
ms24 = run("dp2xtp4", 2, 4)
print(json.dumps({
    "metric": "tp_overhead_ratio_virtual_mesh",
    "dp8_ms": round(ms8, 1), "dp4xtp2_ms": round(ms42, 1),
    "dp2xtp4_ms": round(ms24, 1),
    "tp2_over_dp": round(ms42 / ms8, 3), "tp4_over_dp": round(ms24 / ms8, 3),
    "note": "virtual 8-CPU mesh; ratios only",
}))
