"""Standalone NIQE CLI (reference surface: scripts/metrics/calculate_niqe.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import cv2
import numpy as np

from ssl_tpu.metrics.niqe import calculate_niqe


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--crop_border", type=int, default=0)
    parser.add_argument("--pris_params", default=None)
    args = parser.parse_args()

    scores = []
    for i, name in enumerate(sorted(os.listdir(args.input))):
        img = cv2.imread(os.path.join(args.input, name), cv2.IMREAD_COLOR)
        if img is None:
            continue
        score = calculate_niqe(img[..., ::-1].astype(np.float32), crop_border=args.crop_border,
                               pris_params_path=args.pris_params)
        scores.append(score)
        print(f"{i+1:4d} {name:40s} NIQE: {score:.4f}")
    print(f"Average NIQE: {np.mean(scores):.4f}")


if __name__ == "__main__":
    main()
