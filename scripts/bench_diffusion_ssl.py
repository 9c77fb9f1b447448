"""StableSR-SSL diffusion train-step throughput (128ch dual-cond UNet,
256^2 images, b2, eps + pixel + SSL on the remat-decoded x0).
Recorded in STATUS.md §Perf; run on a real TPU chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from ssl_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
jax.config.update("jax_default_matmul_precision", "bfloat16")
from ssl_tpu.diffusion.ddpm_ssl import DiffusionSSLConfig, StableSRSSL
from ssl_tpu.diffusion.unet import UNetModelDualcondV2, EncoderUNetModelWT
from ssl_tpu.diffusion.vae import AutoencoderKL
from ssl_tpu.losses.ssl_loss import SSLSetting
from ssl_tpu.ops.ssg import SSGConfig

b = int(os.environ.get("BENCH_BATCH", "2"))
sz = int(os.environ.get("BENCH_SZ", "256"))
flash = os.environ.get("BENCH_FLASH_ATTN", "0") == "1"   # A/B: ops/attention.py
cfg = DiffusionSSLConfig(timesteps=1000, context_dim=1024, context_len=77)
model = StableSRSSL(
    cfg,
    unet=UNetModelDualcondV2(model_channels=128, channel_mult=(1, 2, 4, 4), num_heads=8,
                             context_dim=1024, attention_resolutions=(4, 2, 1),
                             use_flash_attention=flash),
    structcond=EncoderUNetModelWT(model_channels=128, channel_mult=(1, 2, 4, 4),
                                  use_flash_attention=flash),
    vae=AutoencoderKL(ch=128, ch_mult=(1, 2, 4, 4), num_res_blocks=2, embed_dim=4,
                      use_flash_attention=flash),
    ssl_setting=SSLSetting(ssg=SSGConfig(q_store_dtype="bfloat16", stream_dtype="bfloat16"),
                           mask_stride=3, capacity=4096, l1_weight=0.5, kl_weight=0.5,
                           impl="dense"),
    lr=1e-4)
state = model.init_state(gt_shape=(b, sz, sz, 3))
rng = np.random.RandomState(0)
batch = {
    "gt": jnp.asarray(rng.rand(b, sz, sz, 3), jnp.float32),
    "lq": jnp.asarray(rng.rand(b, sz, sz, 3), jnp.float32),
    "gt_mask": jnp.asarray(rng.rand(b, sz, sz, 1) < 0.25, jnp.float32),
}
state, logs = model.train_step(state, batch); jax.block_until_ready(state)
steps = 10
t0 = time.perf_counter()
for _ in range(steps):
    state, logs = model.train_step(state, batch)
jax.block_until_ready(state)
dt = (time.perf_counter() - t0) / steps
print(f"stablesr-ssl train step (flash={flash}, b={b}, sz={sz}): "
      f"{dt*1000:.1f} ms = {b/dt:.1f} imgs/s/chip")
