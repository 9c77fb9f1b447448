"""DFDNet face restoration (reference inference/inference_dfdnet.py).

Divergence from the reference surface: the reference detects the 4 facial
part boxes with dlib landmarks at runtime; dlib is not available here, so
part locations are supplied as a JSON file mapping image basename ->
[[x0,y0,x1,y1] for left_eye, right_eye, nose, mouth] at 512-scale (the same
boxes the reference derives from its landmark templates)."""
import argparse
import json
import os

from common import iter_images


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="aligned 512x512 face folder")
    p.add_argument("--output", default="results/dfdnet")
    p.add_argument("--model_path", required=True)
    p.add_argument("--dict_path", required=True,
                   help="reference facial component dictionary .pth")
    p.add_argument("--part_locations", required=True,
                   help="JSON: basename -> 4 [x0,y0,x1,y1] boxes (512-scale)")
    p.add_argument("--param_key", default="params")
    args = p.parse_args()

    from ssl_tpu.archs import build_network
    from ssl_tpu.archs.dfdnet_arch import load_dfdnet_dict
    from ssl_tpu.utils.weight_port import (dfdnet_sn_stats, load_params_auto,
                                           load_torch_state_dict)
    from ssl_tpu.utils.img_util import array2img, img2array, imread, imwrite

    with open(args.part_locations) as f:
        locations = json.load(f)
    dicts = load_dfdnet_dict(args.dict_path)
    net = build_network(dict(type="DFDNet", num_feat=64))

    os.makedirs(args.output, exist_ok=True)
    variables = None
    for path in iter_images(args.input):
        base = os.path.splitext(os.path.basename(path))[0]
        if base not in locations:
            print(f"skip {base}: no part locations")
            continue
        img = img2array(imread(path)) * 2.0 - 1.0
        locs = [np.asarray(b, np.int64).reshape(1, 4) for b in locations[base]]
        if variables is None:
            variables = net.init(jax.random.PRNGKey(0), jnp.asarray(img[None]),
                                 locs, dicts)
            params = load_params_auto(args.model_path, args.param_key,
                                      variables["params"])
            if params is None:
                raise ValueError(f"could not load/convert {args.model_path}")
            stats = variables.get("batch_stats", {})
            if args.model_path.endswith((".pth", ".pt")):
                stats = dfdnet_sn_stats(
                    load_torch_state_dict(args.model_path, args.param_key), stats)
            variables = {"params": params, "batch_stats": stats}
        out = net.apply(variables, jnp.asarray(img[None]), locs, dicts)
        out = (np.asarray(out)[0] + 1.0) / 2.0
        imwrite(array2img(out), os.path.join(args.output, f"{base}_DFDNet.png"))
        print(f"{path} -> {base}_DFDNet.png")


if __name__ == "__main__":
    main()
