"""Offline real-world LR test-set synthesis (reference surface:
scripts/data_preparation/generate_RealESRGAN+BSRGAN_LR.py +
options/generate/generate_RealESRGAN+BSRGAN_LR.yml).

For every GT image, randomly apply either the RealESRGAN two-stage
degradation (p=0.6, matching the reference's `random.random() > 0.4` branch)
or the BSRGAN shuffled chain, then save:
  - the synthesized LR into --save_LR_path
  - its bicubic x`scale` upsample into --save_bicubicSR_path
This reproduces the eval protocol the RealESRGAN/BSRGAN-SSL recipes test on.

Usage:
  python generate_realesrgan_bsrgan_lr.py --param_path options/generate/generate_lr.yml \
      --save_LR_path out/LR --save_bicubicSR_path out/bicubicSR
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import cv2
import numpy as np
import yaml


def realesrgan_lr(img: np.ndarray, opt: dict, scale: int) -> np.ndarray:
    """One image through the two-stage pipeline (no crop/queue: offline)."""
    from ssl_tpu.data.realesr_degradation import RealESRGANDegrader
    from ssl_tpu.data.realesrgan_dataset import _KernelSynth

    synth = _KernelSynth(opt)
    k1, k2, sinc = synth.sample()
    degrader = RealESRGANDegrader(opt, scale=scale, queue_size=0)
    return degrader.degrade_batch(img[None], [k1], [k2], [sinc])[0]


def bsrgan_lr(img: np.ndarray, scale: int) -> np.ndarray:
    """BSRGAN shuffled 7-op chain over the FULL image (no patch crop)."""
    from ssl_tpu.data.bsrgan_degradation import degradation_bsrgan

    h, w = img.shape[:2]
    lq, _ = degradation_bsrgan(img, sf=scale,
                               lq_patchsize=min(h, w) // scale, no_crop=True)
    return lq


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--param_path", required=True, help="generate-options YAML")
    parser.add_argument("--save_LR_path", required=True)
    parser.add_argument("--save_bicubicSR_path", required=True)
    parser.add_argument("--realesrgan_prob", type=float, default=0.6,
                        help="probability of the RealESRGAN branch (ref: 0.6)")
    args = parser.parse_args()

    with open(args.param_path) as f:
        opt = yaml.safe_load(f)
    seed = opt.get("manual_seed", 0)
    random.seed(seed)
    np.random.seed(seed)
    scale = opt.get("scale", 4)
    os.makedirs(args.save_LR_path, exist_ok=True)
    os.makedirs(args.save_bicubicSR_path, exist_ok=True)

    for dataset, dataroot in (opt.get("datasets") or {}).items():
        root = dataroot["dataroot"]
        print(f"dataset {dataset}: {root}")
        for name in sorted(os.listdir(root)):
            img = cv2.imread(os.path.join(root, name), cv2.IMREAD_COLOR)
            if img is None:
                continue
            img = img[..., ::-1].astype(np.float32) / 255.0  # RGB [0,1]
            if random.random() < args.realesrgan_prob:
                lq = realesrgan_lr(img, opt.get("RealESRGAN", {}), scale)
                tag = "realesrgan"
            else:
                lq = bsrgan_lr(img, scale)
                tag = "bsrgan"
            lq8 = (np.clip(lq, 0, 1) * 255.0).round().astype(np.uint8)
            base, _ = os.path.splitext(name)
            cv2.imwrite(os.path.join(args.save_LR_path, base + ".png"),
                        lq8[..., ::-1])
            up = cv2.resize(lq8, (lq8.shape[1] * scale, lq8.shape[0] * scale),
                            interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(os.path.join(args.save_bicubicSR_path, base + ".png"),
                        up[..., ::-1])
            print(f"  {name}: {tag} -> {lq8.shape[1]}x{lq8.shape[0]}")


if __name__ == "__main__":
    main()
