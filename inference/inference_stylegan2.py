"""StyleGAN2 sampling (reference inference/inference_stylegan2.py):
generate --num_samples faces from a converted checkpoint, optional
truncation with a mean latent."""
import argparse
import os

from common import load_net


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    p = argparse.ArgumentParser()
    p.add_argument("--output", default="results/stylegan2")
    p.add_argument("--model_path", required=True)
    p.add_argument("--out_size", type=int, default=512)
    p.add_argument("--num_style_feat", type=int, default=512)
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("--truncation", type=float, default=0.7)
    p.add_argument("--truncation_mean_samples", type=int, default=4096)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--param_key", default="params_ema")
    args = p.parse_args()

    from ssl_tpu.archs import build_network
    from ssl_tpu.utils.weight_port import load_params_auto
    from ssl_tpu.utils.img_util import imwrite

    net = build_network(dict(type="StyleGAN2Generator", out_size=args.out_size,
                             num_style_feat=args.num_style_feat))
    z0 = jnp.zeros((1, args.num_style_feat))
    variables = jax.jit(lambda r: net.init(r, [z0]))(jax.random.PRNGKey(0))
    params = load_params_auto(args.model_path, args.param_key,
                              variables["params"])
    if params is None:
        raise ValueError(f"could not load/convert {args.model_path}")
    v = {"params": params}

    rng = jax.random.PRNGKey(args.seed)
    trunc_latent = None
    if args.truncation < 1:
        # mean latent (reference mean_latent()): average the style-MLP output
        # over many random codes; return_latents exposes the mapped latents
        rng, rm = jax.random.split(rng)
        zs = jax.random.normal(rm, (min(args.truncation_mean_samples, 512),
                                    args.num_style_feat))
        _, lat = net.apply(v, [zs], return_latents=True)
        trunc_latent = lat[:, 0].mean(axis=0, keepdims=True)

    os.makedirs(args.output, exist_ok=True)
    for i in range(args.num_samples):
        rng, rz = jax.random.split(rng)
        z = jax.random.normal(rz, (1, args.num_style_feat))
        img, _ = net.apply(v, [z], truncation=args.truncation,
                           truncation_latent=trunc_latent)
        arr = np.asarray((jnp.clip(img[0], -1, 1) + 1) * 127.5).astype(np.uint8)
        imwrite(arr[..., ::-1], os.path.join(args.output, f"sample_{i:04d}.png"))
    print(f"wrote {args.num_samples} samples to {args.output}")


if __name__ == "__main__":
    main()
