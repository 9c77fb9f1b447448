"""MUSIQ folder CLI (reference surface: scripts/metrics/calculate_musiq.py).
Like the reference, this delegates to the pyiqa package (import-gated)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--restored", required=True)
    args = parser.parse_args()

    from ssl_tpu.metrics.clipiqa import calculate_musiq
    vals = []
    for i, name in enumerate(sorted(os.listdir(args.restored))):
        img = cv2.imread(os.path.join(args.restored, name), cv2.IMREAD_COLOR)
        if img is None:
            continue
        val = calculate_musiq(img[..., ::-1])
        vals.append(val)
        print(f"{i + 1:3d} {name:25}. \tMUSIQ: {val:.6f}")
    if vals:
        print(f"Average MUSIQ: {np.mean(vals):.6f} ({len(vals)} images)")


if __name__ == "__main__":
    main()
