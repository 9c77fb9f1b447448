"""Crop large images into overlapping sub-images for training
(reference surface: scripts/data_preparation/extract_subimages.py; workflow
documented in datasets/README.md: DF2K_OST -> multiscale -> 512x512 subs)."""

import argparse
import os
import sys
from multiprocessing import Pool

import cv2
import numpy as np


def worker(args):
    path, out_dir, crop_size, step, thresh_size = args
    name = os.path.splitext(os.path.basename(path))[0]
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    h, w = img.shape[:2]
    h_space = np.arange(0, h - crop_size + 1, step)
    if h - (h_space[-1] + crop_size) > thresh_size:
        h_space = np.append(h_space, h - crop_size)
    w_space = np.arange(0, w - crop_size + 1, step)
    if w - (w_space[-1] + crop_size) > thresh_size:
        w_space = np.append(w_space, w - crop_size)
    idx = 0
    for x in h_space:
        for y in w_space:
            idx += 1
            patch = img[x:x + crop_size, y:y + crop_size, ...]
            cv2.imwrite(os.path.join(out_dir, f"{name}_s{idx:03d}.png"), patch,
                        [cv2.IMWRITE_PNG_COMPRESSION, 3])
    return name


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--crop_size", type=int, default=512)
    parser.add_argument("--step", type=int, default=256)
    parser.add_argument("--thresh_size", type=int, default=0)
    parser.add_argument("--n_thread", type=int, default=8)
    args = parser.parse_args()

    os.makedirs(args.output, exist_ok=True)
    paths = [os.path.join(args.input, p) for p in sorted(os.listdir(args.input))]
    jobs = [(p, args.output, args.crop_size, args.step, args.thresh_size) for p in paths]
    with Pool(args.n_thread) as pool:
        for i, name in enumerate(pool.imap(worker, jobs)):
            if (i + 1) % 50 == 0:
                print(f"[{i + 1}/{len(jobs)}] {name}")
    print("done")


if __name__ == "__main__":
    main()
