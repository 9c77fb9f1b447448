"""BasicVSR video-SR inference (reference inference/inference_basicvsr.py):
process a frame folder in temporal segments of --interval frames."""
import argparse
import os

from common import load_net, iter_images


def run_video(net, variables, args, arch_label):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ssl_tpu.utils.img_util import array2img, img2array, imread, imwrite

    paths = list(iter_images(args.input))
    os.makedirs(args.output, exist_ok=True)
    jit_apply = jax.jit(lambda v, x: net.apply(v, x))
    for s0 in range(0, len(paths), args.interval):
        seg = paths[s0:s0 + args.interval]
        frames = np.stack([img2array(imread(p)) for p in seg])
        out = np.asarray(jit_apply(variables, jnp.asarray(frames[None])))[0]
        for p, fr in zip(seg, out):
            base = os.path.splitext(os.path.basename(p))[0]
            imwrite(array2img(fr),
                    os.path.join(args.output, f"{base}_{arch_label}.png"))
    print(f"wrote {len(paths)} frames to {args.output}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="LR frame folder")
    p.add_argument("--output", default="results/basicvsr")
    p.add_argument("--model_path", required=True)
    p.add_argument("--num_feat", type=int, default=64)
    p.add_argument("--num_block", type=int, default=30)
    p.add_argument("--interval", type=int, default=15)
    p.add_argument("--param_key", default="params")
    args = p.parse_args()
    net, variables = load_net(
        dict(type="BasicVSR", num_feat=args.num_feat, num_block=args.num_block),
        args.model_path, args.param_key, example_shape=(1, 2, 64, 64, 3))
    run_video(net, variables, args, "BasicVSR")


if __name__ == "__main__":
    main()
