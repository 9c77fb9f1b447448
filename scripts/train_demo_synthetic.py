"""Mini convergence demo: train ESRGAN-SSL on synthetic structured data and
log the loss trajectory (sanity evidence that the full recipe optimizes).

Usage: python scripts/train_demo_synthetic.py [--steps 200] [--batch 8]
Prints loss lines and a final summary json."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def synth_batch(rng, b, gt_size, scale):
    import numpy as np
    from ssl_tpu.ops.edge_mask import edge_mask_np
    from ssl_tpu.utils.matlab_resize import imresize
    gts, lqs, masks = [], [], []
    for _ in range(b):
        yy, xx = np.mgrid[0:gt_size, 0:gt_size] / gt_size
        f1, f2, ph = rng.uniform(4, 16), rng.uniform(4, 16), rng.uniform(0, 6)
        img = np.stack([
            0.5 + 0.4 * np.sin(f1 * yy * 3.14 + ph) * np.cos(f2 * xx * 3.14),
            0.5 + 0.4 * np.cos(f1 * xx * 3.14) * np.sin(f2 * yy * 3.14 + ph),
            (yy + xx) / 2,
        ], -1).astype(np.float32)
        # boxes add edges
        for _ in range(3):
            y0, x0 = rng.randint(0, gt_size - 16, 2)
            img[y0:y0 + 12, x0:x0 + 12] = rng.rand(3)
        img = np.clip(img, 0, 1)
        lq = np.clip(imresize(img, 1.0 / scale), 0, 1).astype(np.float32)
        mask = edge_mask_np(img, 20.0)[..., None]
        gts.append(img); lqs.append(lq); masks.append(mask)
    import numpy as np
    return {"gt": np.stack(gts), "lq": np.stack(lqs), "gt_mask": np.stack(masks)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--gt_size", type=int, default=64)
    parser.add_argument("--log_every", type=int, default=20)
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from ssl_tpu.models import build_model
    from ssl_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    scale = 4
    opt = {
        "name": "demo", "model_type": "ESRGANSSLModel", "scale": scale, "is_train": True,
        "manual_seed": 0, "datasets": {"train": {"gt_size": args.gt_size}},
        "network_g": {"type": "RRDBNet", "num_feat": 32, "num_block": 6, "num_grow_ch": 16,
                      "compute_dtype": os.environ.get("DEMO_G_DTYPE") or None},
        "network_d": {"type": "UNetDiscriminatorSN", "num_feat": 32,
                      "compute_dtype": os.environ.get("DEMO_D_DTYPE") or None},
        "path": {},
        "ssl_setting": {"impl": "dense", "kernel_size_search": 25, "sigma": 0.004,
                        "kernel_size_window": 9, "generalization": True},
        "train": {
            "ema_decay": 0.999,
            "optim_g": {"type": "Adam", "lr": 2e-4}, "optim_d": {"type": "Adam", "lr": 1e-4},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "selfsim_opt": {"type": "L1Loss", "loss_weight": 100.0},
            "selfsim1_opt": {"type": "KLDistanceLoss", "loss_weight": 100.0},
            "gan_opt": {"type": "GANLoss", "gan_type": "vanilla", "loss_weight": 5e-3},
        },
    }
    model = build_model(opt)
    lq = args.gt_size // scale
    state = model.init_state(lq_shape=(args.batch, lq, lq, 3))
    rng = np.random.RandomState(0)

    history = []
    t0 = time.time()
    for step in range(1, args.steps + 1):
        batch = synth_batch(rng, args.batch, args.gt_size, scale)
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        state, logs = model.train_step(state, db)
        if step % args.log_every == 0 or step == 1:
            h = {k: float(v) for k, v in logs.items()}
            history.append({"step": step, **h})
            print(f"step {step:4d}  l_pix {h['l_pix']:.4f}  l_selfsim {h['l_selfsim']:.4f}  "
                  f"l_kl {h['l_selfsim_kl']:.4f}  l_g_total {h['l_g_total']:.4f}", flush=True)
    dt = time.time() - t0
    first, last = history[0], history[-1]
    summary = {
        "steps": args.steps, "seconds": round(dt, 1),
        "l_pix_first": first["l_pix"], "l_pix_last": last["l_pix"],
        "l_selfsim_first": first["l_selfsim"], "l_selfsim_last": last["l_selfsim"],
        "pix_improved": last["l_pix"] < first["l_pix"],
        "ssl_improved": last["l_selfsim"] < first["l_selfsim"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
