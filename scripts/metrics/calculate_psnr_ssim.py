"""Standalone PSNR/SSIM CLI (reference surface: scripts/metrics/calculate_psnr_ssim.py).

Usage:
  python scripts/metrics/calculate_psnr_ssim.py --gt GT_dir --restored SR_dir \
      --crop_border 4 --test_y_channel --suffix ''
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import cv2
import numpy as np

from ssl_tpu.metrics.psnr_ssim import calculate_psnr, calculate_ssim


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gt", required=True)
    parser.add_argument("--restored", required=True)
    parser.add_argument("--crop_border", type=int, default=4)
    parser.add_argument("--suffix", default="", help="suffix of restored files")
    parser.add_argument("--test_y_channel", action="store_true")
    args = parser.parse_args()

    psnrs, ssims = [], []
    names = sorted(os.listdir(args.gt))
    for i, name in enumerate(names):
        gt = cv2.imread(os.path.join(args.gt, name), cv2.IMREAD_COLOR)
        base, ext = os.path.splitext(name)
        restored_path = os.path.join(args.restored, base + args.suffix + ext)
        if not os.path.exists(restored_path):
            cands = [p for p in os.listdir(args.restored) if p.startswith(base)]
            if not cands:
                print(f"skip {name}: no restored file")
                continue
            restored_path = os.path.join(args.restored, cands[0])
        sr = cv2.imread(restored_path, cv2.IMREAD_COLOR)
        h = min(gt.shape[0], sr.shape[0])
        w = min(gt.shape[1], sr.shape[1])
        gt, sr = gt[:h, :w], sr[:h, :w]
        p = calculate_psnr(sr[..., ::-1], gt[..., ::-1], crop_border=args.crop_border,
                           test_y_channel=args.test_y_channel)
        s = calculate_ssim(sr[..., ::-1], gt[..., ::-1], crop_border=args.crop_border,
                           test_y_channel=args.test_y_channel)
        psnrs.append(p)
        ssims.append(s)
        print(f"{i+1:4d} {name:40s} PSNR: {p:.4f} dB  SSIM: {s:.4f}")
    print(f"Average: PSNR {np.mean(psnrs):.4f} dB, SSIM {np.mean(ssims):.4f}")


if __name__ == "__main__":
    main()
