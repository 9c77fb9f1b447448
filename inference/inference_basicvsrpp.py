"""BasicVSR++ video-SR inference (reference inference/inference_basicvsrpp.py)."""
import argparse

from common import load_net
from inference_basicvsr import run_video


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="LR frame folder")
    p.add_argument("--output", default="results/basicvsrpp")
    p.add_argument("--model_path", required=True)
    p.add_argument("--mid_channels", type=int, default=64)
    p.add_argument("--num_blocks", type=int, default=7)
    p.add_argument("--interval", type=int, default=15)
    p.add_argument("--param_key", default="params")
    args = p.parse_args()
    net, variables = load_net(
        dict(type="BasicVSRPlusPlus", mid_channels=args.mid_channels,
             num_blocks=args.num_blocks),
        args.model_path, args.param_key, example_shape=(1, 2, 64, 64, 3))
    run_video(net, variables, args, "BasicVSRpp")


if __name__ == "__main__":
    main()
