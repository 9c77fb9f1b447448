"""SwinIR inference (reference inference/inference_swinir.py)."""
import argparse
import json

from common import load_net, run_image_folder


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", default="results/swinir")
    p.add_argument("--model_path", required=True)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--net_opt", default=None, help="extra SwinIR opts as JSON")
    p.add_argument("--param_key", default="params_ema")
    p.add_argument("--suffix", default="SwinIR")
    args = p.parse_args()
    net_opt = dict(type="SwinIR", upscale=args.scale,
                   **(json.loads(args.net_opt) if args.net_opt else {}))
    net, variables = load_net(net_opt, args.model_path, args.param_key)
    run_image_folder(net, variables, args)


if __name__ == "__main__":
    main()
