"""FID between two folders / vs precomputed GT stats (reference surface:
scripts/metrics/calculate_fid.py + calculate_fid_stats_from_GT.py).

Requires InceptionV3 FID weights (FID_INCEPTION_PTH) for meaningful numbers;
with random init it still runs (architecture smoke / pipeline checks)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import cv2
import numpy as np


def folder_features(folder, model, variables, batch=8, limit=0):
    import jax
    import jax.numpy as jnp
    names = sorted(os.listdir(folder))
    if limit:
        names = names[:limit]
    feats = []
    apply = jax.jit(lambda v, x: model.apply(v, x))
    buf = []
    for name in names:
        img = cv2.imread(os.path.join(folder, name), cv2.IMREAD_COLOR)
        if img is None:
            continue
        img = cv2.resize(img, (299, 299), interpolation=cv2.INTER_LINEAR)
        buf.append(img[..., ::-1].astype(np.float32) / 255.0)
        if len(buf) == batch:
            feats.append(np.asarray(apply(variables, jnp.asarray(np.stack(buf)))))
            buf = []
    if buf:
        feats.append(np.asarray(apply(variables, jnp.asarray(np.stack(buf)))))
    return np.concatenate(feats, 0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--restored", required=True)
    parser.add_argument("--gt", default=None, help="GT folder (or use --gt_stats)")
    parser.add_argument("--gt_stats", default=None, help=".npz with mu/sigma")
    parser.add_argument("--save_stats", default=None, help="save restored-folder stats here")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args()

    from ssl_tpu.metrics.fid import calculate_fid_from_stats, load_inception, stats_from_features
    model, variables = load_inception()

    feats_r = folder_features(args.restored, model, variables, args.batch, args.limit)
    mu_r, sigma_r = stats_from_features(feats_r)
    if args.save_stats:
        np.savez(args.save_stats, mu=mu_r, sigma=sigma_r)
        print(f"saved stats to {args.save_stats}")
    if args.gt_stats:
        d = np.load(args.gt_stats)
        mu_g, sigma_g = d["mu"], d["sigma"]
    elif args.gt:
        feats_g = folder_features(args.gt, model, variables, args.batch, args.limit)
        mu_g, sigma_g = stats_from_features(feats_g)
    else:
        return
    fid = calculate_fid_from_stats(mu_r, sigma_r, mu_g, sigma_g)
    print(f"FID: {fid:.4f}")


if __name__ == "__main__":
    main()
