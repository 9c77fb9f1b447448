"""RRDBNet (ESRGAN / RealESRGAN generator) inference
(reference inference/inference_rrdbnet.py)."""
import argparse

from common import load_net, run_image_folder


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", default="results/rrdbnet")
    p.add_argument("--model_path", required=True)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--num_feat", type=int, default=64)
    p.add_argument("--num_block", type=int, default=23)
    p.add_argument("--param_key", default="params_ema")
    p.add_argument("--suffix", default="RRDBNet")
    args = p.parse_args()
    net, variables = load_net(
        dict(type="RRDBNet", scale=args.scale, num_feat=args.num_feat,
             num_block=args.num_block), args.model_path, args.param_key)
    run_image_folder(net, variables, args)


if __name__ == "__main__":
    main()
