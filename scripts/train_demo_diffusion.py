"""Mini diffusion convergence demo: train the StableSR-SSL step on synthetic
structured data and log the loss trajectory — the bf16-vs-fp32 convergence
A/B harness for the diffusion ``compute_dtype`` knob (same protocol as the
GAN-side DEMO_G_DTYPE A/B recorded in STATUS §Perf).

Usage:
  python scripts/train_demo_diffusion.py [--steps 150] [--batch 2]
      [--size 128] [--dtype bfloat16]
Prints loss lines and a final summary json."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def synth_batch(rng, b, size):
    import numpy as np
    from ssl_tpu.ops.edge_mask import edge_mask_np
    gts, lqs, masks = [], [], []
    for _ in range(b):
        yy, xx = np.mgrid[0:size, 0:size] / size
        f1, f2, ph = rng.uniform(4, 16), rng.uniform(4, 16), rng.uniform(0, 6)
        img = np.stack([
            0.5 + 0.4 * np.sin(f1 * yy * 3.14 + ph) * np.cos(f2 * xx * 3.14),
            0.5 + 0.4 * np.cos(f1 * xx * 3.14) * np.sin(f2 * yy * 3.14 + ph),
            (yy + xx) / 2,
        ], -1).astype(np.float32)
        for _ in range(3):
            y0, x0 = rng.randint(0, size - 16, 2)
            img[y0:y0 + 12, x0:x0 + 12] = rng.rand(3)
        img = np.clip(img, 0, 1)
        # lq = blurred gt (the step upsamples lq to gt size upstream anyway)
        k = np.ones((4, 4), np.float32) / 16
        lq = img.copy()
        from scipy.ndimage import convolve
        for c in range(3):
            lq[..., c] = convolve(img[..., c], k, mode="nearest")
        mask = edge_mask_np(img, 20.0)[..., None]
        gts.append(img); lqs.append(lq); masks.append(mask)
    import numpy as np
    return {"gt": np.stack(gts), "lq": np.stack(lqs), "gt_mask": np.stack(masks)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=150)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--dtype", default=None,
                        help="compute_dtype for UNet/structcond/VAE ('' = fp32)")
    parser.add_argument("--log_every", type=int, default=15)
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from ssl_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from ssl_tpu.diffusion.ddpm_ssl import DiffusionSSLConfig, StableSRSSL
    from ssl_tpu.diffusion.unet import UNetModelDualcondV2, EncoderUNetModelWT
    from ssl_tpu.diffusion.vae import AutoencoderKL
    from ssl_tpu.losses.ssl_loss import SSLSetting
    from ssl_tpu.ops.ssg import SSGConfig

    cdt = args.dtype or None
    cfg = DiffusionSSLConfig(timesteps=1000, context_dim=256, context_len=8,
                             pixel_weight=0.1)
    model = StableSRSSL(
        cfg,
        unet=UNetModelDualcondV2(model_channels=64, channel_mult=(1, 2, 4),
                                 num_heads=4, num_head_channels=-1,
                                 context_dim=256, attention_resolutions=(4, 2),
                                 compute_dtype=cdt),
        structcond=EncoderUNetModelWT(model_channels=64, channel_mult=(1, 1, 2),
                                      out_channels=64, compute_dtype=cdt),
        vae=AutoencoderKL(ch=64, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                          embed_dim=4, compute_dtype=cdt),
        ssl_setting=SSLSetting(ssg=SSGConfig(), mask_stride=3,
                               capacity=(args.size // 4) ** 2,
                               l1_weight=0.5, kl_weight=0.5),
        lr=1e-4)
    state = model.init_state(gt_shape=(args.batch, args.size, args.size, 3))
    rng = np.random.RandomState(0)
    batches = [synth_batch(rng, args.batch, args.size) for _ in range(8)]
    batches = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]

    hist = []
    t0 = time.time()
    for i in range(args.steps):
        state, logs = model.train_step(state, batches[i % len(batches)])
        if i % args.log_every == 0 or i == args.steps - 1:
            logs = {k: float(v) for k, v in logs.items()}
            hist.append({"step": i, **logs})
            print(f"step {i:4d}  " + "  ".join(f"{k}={v:.4f}" for k, v in logs.items()))
    jax.block_until_ready(state.params)
    print(json.dumps({"dtype": cdt or "float32", "steps": args.steps,
                      "sec": round(time.time() - t0, 1),
                      "first": hist[0], "last": hist[-1]}))


if __name__ == "__main__":
    main()
