"""Standalone LPIPS + DISTS folder CLIs (reference surface:
scripts/metrics/calculate_lpips.py + calculate_dists.py).

Usage:
  python scripts/metrics/calculate_lpips_dists.py --metric lpips \
      --gt GT_dir --restored SR_dir --crop_border 4 [--suffix '']

Weights (zero-egress image): LPIPS needs LPIPS_ALEX_PTH (+ ALEXNET_PTH for the
backbone); DISTS needs DISTS_PTH (+ VGG16_PTH).  Images are read BGR by cv2
and flipped to RGB here — the metric boundary is RGB (like the reference's
own wrappers, which flip internally)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import cv2
import numpy as np


def iter_pairs(gt_dir, restored_dir, suffix):
    for name in sorted(os.listdir(gt_dir)):
        base, ext = os.path.splitext(name)
        restored_path = os.path.join(restored_dir, base + suffix + ext)
        if not os.path.exists(restored_path):
            cands = [p for p in sorted(os.listdir(restored_dir)) if p.startswith(base)]
            if not cands:
                print(f"skip {name}: no restored file")
                continue
            restored_path = os.path.join(restored_dir, cands[0])
        gt = cv2.imread(os.path.join(gt_dir, name), cv2.IMREAD_COLOR)[..., ::-1]
        restored = cv2.imread(restored_path, cv2.IMREAD_COLOR)[..., ::-1]
        yield name, gt, restored


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--metric", choices=["lpips", "dists"], required=True)
    parser.add_argument("--gt", required=True)
    parser.add_argument("--restored", required=True)
    parser.add_argument("--crop_border", type=int, default=4)
    parser.add_argument("--suffix", default="")
    parser.add_argument("--weights", default=None,
                        help="metric checkpoint (else LPIPS_ALEX_PTH/DISTS_PTH)")
    args = parser.parse_args()

    if args.metric == "lpips":
        from ssl_tpu.metrics.lpips_metric import calculate_lpips as fn
    else:
        from ssl_tpu.metrics.dists_metric import calculate_dists as fn

    vals = []
    for i, (name, gt, restored) in enumerate(
            iter_pairs(args.gt, args.restored, args.suffix)):
        val = fn(restored, gt, crop_border=args.crop_border,
                 weights_path=args.weights)
        vals.append(val)
        print(f"{i + 1:3d} {name:25}. \t{args.metric.upper()}: {val:.6f}")
    if vals:
        print(f"Average {args.metric.upper()}: {np.mean(vals):.6f} "
              f"({len(vals)} images)")


if __name__ == "__main__":
    main()
