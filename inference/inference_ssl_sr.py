"""Single-image / folder SR inference CLI (reference surface: inference/*.py).

Usage:
  python inference/inference_ssl_sr.py --input imgs/ --output out/ \
      --model_path experiments/.../net_g_400000.pkl --arch RRDBNet --scale 4
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--arch", default="RRDBNet")
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--num_feat", type=int, default=64)
    parser.add_argument("--num_block", type=int, default=23)
    parser.add_argument("--param_key", default="params_ema")
    parser.add_argument("--net_opt", default=None,
                        help='extra network_g options as JSON, e.g. \'{"num_grow_ch": 32}\'')
    parser.add_argument("--tile_size", type=int, default=0, help="0 = no tiling")
    parser.add_argument("--tile_pad", type=int, default=32)
    parser.add_argument("--spatial", action="store_true",
                        help="shard the image height across all devices "
                             "(halo exchange over ICI; parallel/spatial.py)")
    parser.add_argument("--spatial_halo", type=int, default=32)
    args = parser.parse_args()

    from ssl_tpu.models import build_model
    from ssl_tpu.utils.img_util import array2img, img2array, imread, imwrite
    from ssl_tpu.utils.weight_port import load_params_auto

    opt = {
        "name": "inference", "model_type": "SRModel", "scale": args.scale,
        "is_train": False, "manual_seed": 0,
        "network_g": {"type": args.arch, "num_feat": args.num_feat,
                      "num_block": args.num_block,
                      **(json.loads(args.net_opt) if args.net_opt else {})},
        "path": {},
        "tile_process": args.tile_size > 0,
        "tile_size": args.tile_size, "tile_pad": args.tile_pad,
        "spatial_infer": args.spatial, "spatial_halo": args.spatial_halo,
    }
    model = build_model(opt)
    state = model.init_state(lq_shape=(1, 64, 64, 3))
    loaded = load_params_auto(args.model_path, args.param_key, state.params_g)
    if loaded is None:
        raise ValueError(f"could not load weights from {args.model_path}")
    state = state.replace(params_g=loaded, ema_params_g=None)

    os.makedirs(args.output, exist_ok=True)
    paths = ([os.path.join(args.input, p) for p in sorted(os.listdir(args.input))]
             if os.path.isdir(args.input) else [args.input])
    for path in paths:
        img = img2array(imread(path))
        sr = model.test(state, img[None])
        out_path = os.path.join(args.output, os.path.basename(path))
        imwrite(array2img(sr[0]), out_path)
        print(f"{path} -> {out_path}")


if __name__ == "__main__":
    main()
