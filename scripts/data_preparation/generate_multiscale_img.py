"""Generate multiscale copies of HR images (reference surface:
scripts/data_preparation/generate_multiscale_img.py: scales 1, 0.75, 0.5, 1/3
with matlab-faithful bicubic)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import cv2
import numpy as np

from ssl_tpu.utils.matlab_resize import imresize_uint8


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--scales", type=float, nargs="+", default=[1.0, 0.75, 0.5, 1 / 3])
    args = parser.parse_args()

    os.makedirs(args.output, exist_ok=True)
    names = sorted(os.listdir(args.input))
    for i, name in enumerate(names):
        img = cv2.imread(os.path.join(args.input, name), cv2.IMREAD_UNCHANGED)
        base = os.path.splitext(name)[0]
        for j, s in enumerate(args.scales):
            out = img if s == 1.0 else imresize_uint8(img, s)
            cv2.imwrite(os.path.join(args.output, f"{base}T{j}.png"), out)
        if (i + 1) % 50 == 0:
            print(f"[{i + 1}/{len(names)}]")
    print("done")


if __name__ == "__main__":
    main()
