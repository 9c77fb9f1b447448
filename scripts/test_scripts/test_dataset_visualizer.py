"""Dataset visualizer (reference surface: GAN-Based-SR/test_scripts/
test_{paired_image,reds,vimeo90k,ffhq}_dataset.py — iterate a dataset
through the real dataloader and dump the augmented batches as image files
for eyeballing).  One generic tool for EVERY registered dataset: point it
at an option YAML's dataset block (or pass --type/--kv inline).

Usage:
  python scripts/test_scripts/test_dataset_visualizer.py \
      --opt options/train/ESRGANSSL/train_ESRGANSSL_bicubic_x4.yml \
      [--phase train] [--num 4] [--outdir tmp/dataset_vis]
  python scripts/test_scripts/test_dataset_visualizer.py \
      --type REDSRecurrentDataset --kv dataroot_gt=... dataroot_lq=... \
      meta_info_file=... num_frame=3 gt_size=64
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def _parse_kv(pairs):
    out = {}
    for kv in pairs or []:
        k, v = kv.split("=", 1)
        try:
            import yaml
            out[k] = yaml.safe_load(v)
        except Exception:
            out[k] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", help="train YAML whose datasets.<phase> to use")
    ap.add_argument("--phase", default="train")
    ap.add_argument("--type", help="dataset type for inline mode")
    ap.add_argument("--kv", nargs="*", help="inline dataset options k=v")
    ap.add_argument("--num", type=int, default=4, help="items to dump")
    ap.add_argument("--outdir", default="tmp/dataset_vis")
    args = ap.parse_args()

    import numpy as np

    from ssl_tpu.data import build_dataset
    from ssl_tpu.utils.img_util import array2img, imwrite

    if args.opt:
        from ssl_tpu.utils.options import ordered_yaml_load
        full = ordered_yaml_load(args.opt)
        ds_opt = dict(full["datasets"][args.phase])
        ds_opt.setdefault("phase", args.phase)
        ds_opt.setdefault("scale", full.get("scale", 4))
    else:
        assert args.type, "--opt or --type required"
        ds_opt = {"name": "vis", "type": args.type, "phase": args.phase,
                  **_parse_kv(args.kv)}
    ds = build_dataset(ds_opt)
    os.makedirs(args.outdir, exist_ok=True)
    print(f"{ds_opt['type']}: {len(ds)} items")
    for i in range(min(args.num, len(ds))):
        item = ds[i]
        for key, val in item.items():
            if not isinstance(val, np.ndarray) or val.ndim < 3:
                continue
            frames = val if val.ndim == 4 else val[None]
            for t, frame in enumerate(frames):
                if frame.shape[-1] not in (1, 3):
                    continue  # latents etc.
                name = f"{i:03d}_{key}" + (f"_t{t}" if val.ndim == 4 else "") + ".png"
                imwrite(array2img(np.clip(frame, 0, 1)),
                        os.path.join(args.outdir, name))
        keys = {k: (tuple(v.shape) if isinstance(v, np.ndarray) else v)
                for k, v in item.items()}
        print(f"  item {i}: {keys}")
    print(f"wrote visualizations to {args.outdir}")


if __name__ == "__main__":
    main()
