"""Same-host CPU anchor: the reference's OWN torch ESRGAN-SSL G-step vs ours.

VERDICT round 1 flagged bench.py's A100 anchor as invented.  The repo has no
GPU, so the only *reproducible* anchor is a same-host comparison: run the
reference's actual code (RRDBNet-23 forward, per-image ssl_pytorch loop,
L1 pixel + SSG-L1 + SSG-KL, backward, Adam) and our JAX step with the same
shapes/hyper-parameters on this CPU, and report both imgs/s plus the ratio.

Both sides omit the VGG19 perceptual term and the discriminator (torchvision
pretrained weights are unavailable offline; the omission is symmetric).

Usage:  python scripts/bench_reference_cpu.py [--batch 2] [--gt 128] [--steps 2]
Prints one JSON line:
  {"ref_imgs_per_sec": ..., "ours_imgs_per_sec": ..., "ours_vs_ref": ...}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def lattice_mask(h, w, stride=6):
    import numpy as np
    m = np.zeros((h, w), np.float32)
    m[2:h - 2:stride, 2:w - 2:stride] = 1.0
    return m


def bench_reference(batch, gt_size, steps, mask):
    """The reference's own code: basicsr RRDBNet + ssl_pytorch loop + the
    relativistic-GAN G/D alternation from esrganssl_model.py:216-281."""
    import numpy as np
    import torch
    from ref_loader import ref_module

    arch = ref_module("basicsr.archs.rrdbnet_arch")
    darch = ref_module("basicsr.archs.discriminator_arch")
    lu = ref_module("basicsr.losses.loss_util")
    bl = ref_module("basicsr.losses.basic_loss")
    gl = ref_module("basicsr.losses.gan_loss")

    torch.manual_seed(0)
    net = arch.RRDBNet(3, 3, scale=4, num_feat=64, num_block=23, num_grow_ch=32)
    net_d = darch.UNetDiscriminatorSN(3, num_feat=64)
    optg = torch.optim.Adam(net.parameters(), lr=1e-4, betas=(0.9, 0.99))
    optd = torch.optim.Adam(net_d.parameters(), lr=1e-4, betas=(0.9, 0.99))
    cri_pix = bl.L1Loss(loss_weight=1e-2)
    cri_l1 = bl.L1Loss(loss_weight=1e3)
    cri_kl = bl.KLDistanceLoss(loss_weight=1e3)
    cri_gan = gl.GANLoss("vanilla", loss_weight=5e-3)

    rng = np.random.RandomState(0)
    lq = torch.from_numpy(rng.rand(batch, 3, gt_size // 4, gt_size // 4).astype(np.float32))
    gt = torch.from_numpy(rng.rand(batch, 3, gt_size, gt_size).astype(np.float32))
    gt_mask = torch.from_numpy(np.broadcast_to(mask, (batch, 1, gt_size, gt_size)).copy())

    def step():
        for p in net_d.parameters():
            p.requires_grad = False
        optg.zero_grad()
        out = net(lq)
        total = cri_pix(out, gt)
        srs, gts = [], []
        for i in range(batch):  # the reference's per-image loop
            m = gt_mask[i].unsqueeze(0)
            srs.append(lu.similarity_map(
                img=out[i].unsqueeze(0), mask=m, ssl_mode="pytorch",
                kernel_size_search=25, kernel_size_window=9, sigma=0.004,
                generalization=True).getitem())
            gts.append(lu.similarity_map(
                img=gt[i].unsqueeze(0), mask=m, ssl_mode="pytorch",
                kernel_size_search=25, kernel_size_window=9, sigma=0.004,
                generalization=True).getitem())
        sr_cat, gt_cat = torch.cat(srs, 1), torch.cat(gts, 1)
        total = total + cri_l1(sr_cat, gt_cat) + cri_kl(sr_cat, gt_cat)
        # relativistic GAN g-loss (esrganssl_model.py:238-246)
        real_d_pred = net_d(gt).detach()
        fake_g_pred = net_d(out)
        l_g_real = cri_gan(real_d_pred - torch.mean(fake_g_pred), False, is_disc=False)
        l_g_fake = cri_gan(fake_g_pred - torch.mean(real_d_pred), True, is_disc=False)
        total = total + (l_g_real + l_g_fake) / 2
        total.backward()
        optg.step()
        # D phase: two separate backwards (esrganssl_model.py:251-274)
        for p in net_d.parameters():
            p.requires_grad = True
        optd.zero_grad()
        fake_d_pred = net_d(out.detach())
        real_d_pred = net_d(gt)
        l_d_real = cri_gan(real_d_pred - torch.mean(fake_d_pred.detach()), True,
                           is_disc=True) * 0.5
        l_d_real.backward()
        fake_d_pred = net_d(out.detach())
        l_d_fake = cri_gan(fake_d_pred - torch.mean(real_d_pred.detach()), False,
                           is_disc=True) * 0.5
        l_d_fake.backward()
        optd.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    return batch * steps / (time.perf_counter() - t0)


def bench_ours(batch, gt_size, steps, mask):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ssl_tpu.models import build_model

    opt = {
        "name": "anchor", "model_type": "ESRGANSSLModel", "scale": 4,
        "is_train": True, "manual_seed": 0,
        "datasets": {"train": {"gt_size": gt_size}},
        "network_g": {"type": "RRDBNet", "num_feat": 64, "num_block": 23,
                      "num_grow_ch": 32},
        "network_d": {"type": "UNetDiscriminatorSN", "num_feat": 64},
        "path": {},
        "ssl_setting": {"mask_stride": 3, "kernel_size_search": 25,
                        "sigma": 0.004, "kernel_size_window": 9,
                        "generalization": True, "impl": "dense"},
        "train": {
            "optim_g": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
            "optim_d": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [50000], "gamma": 0.5},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1e-2},
            "selfsim_opt": {"type": "L1Loss", "loss_weight": 1e3},
            "selfsim1_opt": {"type": "KLDistanceLoss", "loss_weight": 1e3},
            "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                        "loss_weight": 5e-3},
            # no perceptual on either side (no torchvision VGG weights offline)
        },
    }
    model = build_model(opt)
    state = model.init_state(lq_shape=(batch, gt_size // 4, gt_size // 4, 3))
    rng = np.random.RandomState(0)
    data = {
        "lq": jnp.asarray(rng.rand(batch, gt_size // 4, gt_size // 4, 3), jnp.float32),
        "gt": jnp.asarray(rng.rand(batch, gt_size, gt_size, 3), jnp.float32),
        "gt_mask": jnp.asarray(np.broadcast_to(mask[..., None],
                                               (batch, gt_size, gt_size, 1)).copy()),
    }
    state, _ = model.train_step(state, data)  # compile + warmup
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, _ = model.train_step(state, data)
    jax.block_until_ready(state)
    return batch * steps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--gt", type=int, default=128)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--mask-stride", type=int, default=6)
    args = ap.parse_args()

    mask = lattice_mask(args.gt, args.gt, args.mask_stride)
    ref = bench_reference(args.batch, args.gt, args.steps, mask)
    ours = bench_ours(args.batch, args.gt, args.steps, mask)
    print(json.dumps({
        "ref_imgs_per_sec": round(ref, 4),
        "ours_imgs_per_sec": round(ours, 4),
        "ours_vs_ref": round(ours / ref, 3),
        "conditions": {"batch": args.batch, "gt": args.gt, "steps": args.steps,
                       "host": "same CPU, full G+D recipe, no VGG perceptual on either side"},
    }))


if __name__ == "__main__":
    main()
