"""Turn-key quality-parity harness (reference eval protocol, end-to-end).

The reference's test protocol (GAN-Based-SR/datasets/README_TEST.MD §1.2):
crop each GT so H/W are divisible by 12, bicubic-downsample x4 (matlab
semantics), infer, then score PSNR / SSIM (Y, crop 4) / NIQE and — weights
permitting — LPIPS / DISTS.  This script runs that whole protocol on OUR
framework from a reference ``.pth`` checkpoint, and (``--ref-spec``) runs the
reference's own torch module on the SAME inputs so the two output stacks and
metric tables land side by side.  The day real released checkpoints appear,
the parity table is this one command:

  python scripts/eval_parity.py --ckpt net_g.pth \
      --arch '{"type": "RRDBNet", "num_feat": 64, "num_block": 23}' \
      --gt datasets/Set5/GTmod12 \
      --ref-spec '{"module": "basicsr.archs.rrdbnet_arch", "cls": "RRDBNet",
                   "kwargs": {"num_in_ch": 3, "num_out_ch": 3}}'

Without ``--gt`` it generates smooth synthetic GTs (``--synthetic N``) so the
harness itself is verifiable offline (tests/test_eval_cli.py).  ``--arch`` /
``--ref-spec`` take inline JSON/YAML or a path to a YAML file.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _load_spec(s):
    import yaml
    if s is None:
        return None
    if os.path.exists(s):
        with open(s) as f:
            return yaml.safe_load(f)
    return yaml.safe_load(s)


def mod_crop(img: np.ndarray, mod: int = 12) -> np.ndarray:
    """GT crop so H/W are divisible by `mod` (reference README_TEST.MD §1.2)."""
    h, w = img.shape[:2]
    return img[: h - h % mod, : w - w % mod]


def _synthetic_gts(n: int, size: int, seed: int = 0):
    """Smooth random images (low-pass noise) — stand-ins for GT photos."""
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        base = rng.rand(size // 8, size // 8, 3).astype(np.float32)
        img = np.kron(base, np.ones((8, 8, 1), np.float32))
        # light blur so bicubic down/up is well-behaved
        k = np.ones((3, 3), np.float32) / 9.0
        for c in range(3):
            from scipy.ndimage import convolve  # noqa — scipy is baked in
            img[..., c] = convolve(img[..., c], k, mode="nearest")
        out.append((f"synthetic_{i:03d}", np.clip(img, 0, 1)))
    return out


def _iter_gts(args):
    if args.gt:
        from ssl_tpu.utils.img_util import img2array, imread
        exts = (".png", ".jpg", ".jpeg", ".bmp")
        for name in sorted(os.listdir(args.gt)):
            if name.lower().endswith(exts):
                yield os.path.splitext(name)[0], img2array(imread(os.path.join(args.gt, name)))
    else:
        yield from _synthetic_gts(args.synthetic, args.synthetic_size)


def _metrics_row(sr: np.ndarray, gt: np.ndarray, scale: int) -> dict:
    """The protocol's metric set on one image (0-1 float HWC)."""
    from ssl_tpu.metrics.niqe import calculate_niqe
    from ssl_tpu.metrics.psnr_ssim import calculate_psnr, calculate_ssim
    sr8 = (np.clip(sr, 0, 1) * 255.0).round()
    gt8 = (np.clip(gt, 0, 1) * 255.0).round()
    row = {
        "psnr": calculate_psnr(sr8, gt8, crop_border=scale),
        "ssim": calculate_ssim(sr8, gt8, crop_border=scale),
        "psnr_y": calculate_psnr(sr8, gt8, crop_border=scale, test_y_channel=True),
        "ssim_y": calculate_ssim(sr8, gt8, crop_border=scale, test_y_channel=True),
    }
    try:
        row["niqe"] = calculate_niqe(sr8, crop_border=scale)
    except Exception:
        row["niqe"] = float("nan")
    if os.environ.get("LPIPS_ALEX_PTH"):
        from ssl_tpu.metrics.lpips_metric import calculate_lpips
        row["lpips"] = calculate_lpips(sr8, gt8, crop_border=scale)
    if os.environ.get("DISTS_PTH"):
        from ssl_tpu.metrics.dists_metric import calculate_dists
        row["dists"] = calculate_dists(sr8, gt8, crop_border=scale)
    return row


def _run_reference(spec: dict, ckpt: str, lrs, param_key: str):
    """Execute the reference's own torch arch on the same LR stack."""
    import torch
    tests_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    sys.path.insert(0, tests_dir)
    from ref_loader import ref_module
    mod = ref_module(spec["module"])
    net = getattr(mod, spec["cls"])(**spec.get("kwargs", {}))
    sd = torch.load(ckpt, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and param_key in sd:
        sd = sd[param_key]
    elif isinstance(sd, dict) and "params" in sd:
        sd = sd["params"]
    net.load_state_dict(sd, strict=True)
    net.eval()
    outs = []
    with torch.no_grad():
        for lr in lrs:
            x = torch.from_numpy(lr.transpose(2, 0, 1)[None]).float()
            outs.append(net(x)[0].numpy().transpose(1, 2, 0))
    return outs


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--ckpt", required=True, help=".pth (torch) or .pkl (ours)")
    ap.add_argument("--arch", required=True,
                    help="net_opt JSON/YAML (inline or file), e.g. "
                         '\'{"type": "RRDBNet", "num_feat": 64, "num_block": 23}\'')
    ap.add_argument("--gt", default=None, help="GT image folder (protocol input)")
    ap.add_argument("--synthetic", type=int, default=4,
                    help="without --gt: number of synthetic GTs")
    ap.add_argument("--synthetic-size", type=int, default=96)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--mod", type=int, default=12, help="GT mod-crop divisor")
    ap.add_argument("--param-key", default="params_ema")
    ap.add_argument("--ref-spec", default=None,
                    help="reference torch arch spec JSON/YAML: "
                         '{"module": ..., "cls": ..., "kwargs": {...}} — '
                         "runs /root/reference's own module for the parity columns")
    ap.add_argument("--out", default=None, help="optional output dir for SR PNGs")
    ap.add_argument("--json", action="store_true", help="emit one JSON line only")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "inference"))
    from common import load_net
    from ssl_tpu.utils.matlab_resize import imresize

    net_opt = _load_spec(args.arch)
    lq_probe = max(8, args.synthetic_size // args.scale)
    net, variables = load_net(net_opt, args.ckpt, args.param_key,
                              example_shape=(1, lq_probe, lq_probe, 3))
    jit_apply = jax.jit(lambda v, x: net.apply(v, x))

    names, gts, lrs, ours = [], [], [], []
    for name, gt in _iter_gts(args):
        gt = mod_crop(gt, args.mod)
        lr = imresize(gt, 1.0 / args.scale).astype(np.float32)
        sr = np.asarray(jit_apply(variables, jnp.asarray(lr[None], jnp.float32)))[0]
        names.append(name); gts.append(gt); lrs.append(lr); ours.append(sr)

    if args.out:
        from ssl_tpu.utils.img_util import array2img, imwrite
        os.makedirs(args.out, exist_ok=True)
        for name, sr in zip(names, ours):
            imwrite(array2img(sr), os.path.join(args.out, f"{name}_ssl_tpu.png"))

    def _mean(vals):
        finite = [v for v in vals if np.isfinite(v)]
        return float(np.mean(finite)) if finite else float("nan")

    rows = [_metrics_row(sr, gt, args.scale) for sr, gt in zip(ours, gts)]
    table = {k: _mean([r[k] for r in rows]) for k in rows[0]}
    result = {"n_images": len(names), "ours": table}

    if args.ref_spec:
        refs = _run_reference(_load_spec(args.ref_spec), args.ckpt, lrs, args.param_key)
        ref_rows = [_metrics_row(sr, gt, args.scale) for sr, gt in zip(refs, gts)]
        result["reference"] = {k: _mean([r[k] for r in ref_rows])
                               for k in ref_rows[0]}
        # output-level parity: our SR vs the reference's SR, per image
        diffs = [float(np.abs(a - b).max()) for a, b in zip(ours, refs)]
        out_psnr = [float(10 * np.log10(1.0 / max(np.mean((a - b) ** 2), 1e-12)))
                    for a, b in zip(ours, refs)]
        result["parity"] = {"max_abs_diff": max(diffs),
                            "min_output_psnr": min(out_psnr),
                            "mean_output_psnr": float(np.mean(out_psnr))}

    if args.json:
        print(json.dumps(result))
        return result

    print(f"\n== eval protocol: {len(names)} images, x{args.scale}, mod-{args.mod} crop ==")
    hdr = ["metric", "ours"] + (["reference", "delta"] if args.ref_spec else [])
    print(" | ".join(f"{h:>12}" for h in hdr))
    for k in table:
        row = [k, f"{table[k]:.4f}"]
        if args.ref_spec:
            rv = result["reference"].get(k, float("nan"))
            row += [f"{rv:.4f}", f"{table[k] - rv:+.4f}"]
        print(" | ".join(f"{c:>12}" for c in row))
    if args.ref_spec:
        p = result["parity"]
        print(f"\noutput parity vs reference torch: max|diff| {p['max_abs_diff']:.2e}, "
              f"output PSNR min {p['min_output_psnr']:.1f} / mean {p['mean_output_psnr']:.1f} dB")
    return result


if __name__ == "__main__":
    main()
