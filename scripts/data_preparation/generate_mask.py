"""Offline edge-mask generation (reference surface:
scripts/data_preparation/generate_mask.py and the diffusion tree's
generate_mask_simmatrix.py).

For each image: grayscale 'L' -> (optional LoG pre-blur) -> Laplacian CV_8U ->
threshold -> save .mat (key 'mat') + .png preview + edge-pixel statistics.

Usage:
  python scripts/data_preparation/generate_mask.py \
      --input datasets/DF2K_OST/multiscale_HR_sub_512 \
      --output datasets/DF2K_OST/mask_selfsim --threshold 20
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import cv2
import numpy as np
from scipy.io import savemat

from ssl_tpu.ops.edge_mask import edge_mask_np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--threshold", type=float, default=20.0)
    parser.add_argument("--mode", type=str, default="Laplacian", choices=["Laplacian", "LoG"])
    parser.add_argument("--log_sigma", type=float, default=1.0)
    parser.add_argument("--color_mode", type=str, default="L", choices=["L", "RGB"],
                        help="simmatrix --mode: RGB keeps a 3-channel mask")
    parser.add_argument("--gaussian_kernel_size", type=int, default=0,
                        help="simmatrix LoG pre-blur ksize (sigma from ksize); "
                             "0 = use --log_sigma")
    parser.add_argument("--no_png", action="store_true", help="skip .png previews")
    args = parser.parse_args()

    tag = f"{args.mode}/{args.color_mode}/threshold-{args.threshold}"
    mat_dir = os.path.join(args.output, tag, "mat")
    png_dir = os.path.join(args.output, tag, "png")
    os.makedirs(mat_dir, exist_ok=True)
    if not args.no_png:
        os.makedirs(png_dir, exist_ok=True)

    stats = []
    names = sorted(os.listdir(args.input))
    for i, name in enumerate(names):
        path = os.path.join(args.input, name)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            continue
        img = img[..., ::-1]  # BGR->RGB
        mask = edge_mask_np(img, args.threshold, use_log=(args.mode == "LoG"),
                            log_sigma=args.log_sigma, color_mode=args.color_mode,
                            log_ksize=args.gaussian_kernel_size)
        base = os.path.splitext(name)[0]
        savemat(os.path.join(mat_dir, base + ".mat"), {"mat": mask.astype(np.float64)})
        if not args.no_png:
            png = (mask * 255).astype(np.uint8)
            if png.ndim == 3:
                png = png[..., ::-1]  # RGB mask -> BGR for imwrite
            cv2.imwrite(os.path.join(png_dir, base + ".png"), png)
        frac = float(mask.mean())
        stats.append(f"{name} {int(mask.sum())} {frac:.6f}")
        if (i + 1) % 100 == 0:
            print(f"[{i + 1}/{len(names)}] {name}")

    with open(os.path.join(args.output, tag, "edge_pixel_stats.txt"), "w") as f:
        f.write("\n".join(stats) + "\n")
    print(f"done: {len(stats)} masks -> {mat_dir}")


if __name__ == "__main__":
    main()
