"""Precompute InceptionV3 FID stats for a GT folder (reference surface:
scripts/metrics/calculate_fid_stats_from_GT.py).

Usage: python calculate_fid_stats_from_GT.py --gt GT_dir --out stats.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

from calculate_fid_folder import folder_features  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gt", required=True)
    parser.add_argument("--out", required=True, help="output .npz (mu/sigma)")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args()

    from ssl_tpu.metrics.fid import load_inception, stats_from_features
    model, variables = load_inception()
    feats = folder_features(args.gt, model, variables, args.batch, args.limit)
    mu, sigma = stats_from_features(feats)
    np.savez(args.out, mu=mu, sigma=sigma)
    print(f"saved FID stats for {len(feats)} images to {args.out}")


if __name__ == "__main__":
    main()
