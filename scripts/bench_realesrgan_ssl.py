"""RealESRGAN-SSL full-step throughput (gt 256^2, b12, 5-tap VGG
perceptual, on-device two-stage degradation + USM inside the jit).
Recorded in STATUS.md §Perf; run on a real TPU chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from ssl_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
jax.config.update("jax_default_matmul_precision", "bfloat16")
from ssl_tpu.data.realesrgan_dataset import _KernelSynth
from ssl_tpu.models import build_model
b, gt_size = 12, 256
opt = {
    "name": "ressl_bench", "model_type": "RealESRGANSSLModel", "scale": 4,
    "is_train": True, "manual_seed": 0, "degradation_device": True,
    "queue_size": 0, "datasets": {"train": {"gt_size": gt_size}},
    "network_g": {"type": "RRDBNet", "num_feat": 64, "num_block": 23, "num_grow_ch": 32,
                  "remat_policy": "none"},
    "network_d": {"type": "UNetDiscriminatorSN", "num_feat": 64},
    "path": {},
    "ssl_setting": {"mask_stride": 3, "impl": "dense", "kernel_size_search": 25,
                    "sigma": 0.004, "kernel_size_window": 9, "generalization": True,
                    "q_store_dtype": "bfloat16", "stream_dtype": "bfloat16"},
    "train": {
        "ema_decay": 0.999,
        "optim_g": {"type": "Adam", "lr": 1e-4}, "optim_d": {"type": "Adam", "lr": 1e-4},
        "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
        "perceptual_opt": {"type": "PerceptualLoss",
                           "layer_weights": {"conv1_2": 0.1, "conv2_2": 0.1, "conv3_4": 1,
                                             "conv4_4": 1, "conv5_4": 1},
                           "perceptual_weight": 1.0, "style_weight": 0, "criterion": "l1"},
        "selfsim_opt": {"type": "L1Loss", "loss_weight": 1e3},
        "selfsim1_opt": {"type": "KLDistanceLoss", "loss_weight": 1e3},
        "gan_opt": {"type": "GANLoss", "gan_type": "vanilla", "loss_weight": 1e-1},
    },
}
model = build_model(opt)
rng = np.random.RandomState(0)
synth = _KernelSynth({})
ks = [synth.sample() for _ in range(b)]
batch = {
    "gt": jnp.asarray(rng.rand(b, gt_size, gt_size, 3), jnp.float32),
    "gt_mask": jnp.asarray(rng.rand(b, gt_size, gt_size, 1) < 0.25, jnp.float32),
    "kernel1": jnp.asarray(np.stack([k[0] for k in ks])),
    "kernel2": jnp.asarray(np.stack([k[1] for k in ks])),
    "sinc_kernel": jnp.asarray(np.stack([k[2] for k in ks])),
}
state = model.init_state(lq_shape=(b, gt_size // 4, gt_size // 4, 3))
state, logs = model.train_step(state, batch); jax.block_until_ready(state)
steps = 8
t0 = time.perf_counter()
for _ in range(steps):
    state, logs = model.train_step(state, batch)
jax.block_until_ready(state)
dt = (time.perf_counter() - t0) / steps
print(f"realesrgan-ssl device-degradation step: {dt*1000:.1f} ms = {b/dt:.1f} imgs/s/chip")
