"""RIDNet denoising inference (reference inference/inference_ridnet.py)."""
import argparse

from common import load_net, run_image_folder


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", default="results/ridnet")
    p.add_argument("--model_path", required=True)
    p.add_argument("--num_feat", type=int, default=64)
    p.add_argument("--param_key", default="params")
    p.add_argument("--suffix", default="RIDNet")
    args = p.parse_args()
    net, variables = load_net(dict(type="RIDNet", num_feat=args.num_feat),
                              args.model_path, args.param_key)
    run_image_folder(net, variables, args)


if __name__ == "__main__":
    main()
