"""Shared helpers for the per-arch inference CLIs (reference surface:
GAN-Based-SR/inference/*.py — one thin entrypoint per released model
family, all built on the same load-convert-run core)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def load_net(net_opt: dict, model_path: str, param_key: str = "params_ema",
             example_shape=(1, 64, 64, 3)):
    """Build a registered arch and load a checkpoint (.pkl ours / .pth torch
    via the converters)."""
    import jax
    import jax.numpy as jnp
    from ssl_tpu.archs import build_network
    from ssl_tpu.utils.weight_port import load_params_auto

    net = build_network(dict(net_opt))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0),
                                  jnp.zeros(example_shape, jnp.float32))
    params = load_params_auto(model_path, param_key, variables["params"])
    if params is None and param_key != "params":
        params = load_params_auto(model_path, "params", variables["params"])
    if params is None:
        raise ValueError(f"could not load/convert weights from {model_path}")
    return net, {"params": params, **{k: v for k, v in variables.items()
                                      if k != "params"}}


def iter_images(input_path: str):
    exts = (".png", ".jpg", ".jpeg", ".bmp")
    if os.path.isdir(input_path):
        for name in sorted(os.listdir(input_path)):
            if name.lower().endswith(exts):
                yield os.path.join(input_path, name)
    else:
        yield input_path


def run_image_folder(net, variables, args, apply_fn=None):
    """Run a (b,h,w,3)->(b,H,W,3) net over --input, write PNGs to --output."""
    import jax
    import jax.numpy as jnp
    from ssl_tpu.utils.img_util import array2img, img2array, imread, imwrite

    apply_fn = apply_fn or (lambda v, x: net.apply(v, x))
    jit_apply = jax.jit(apply_fn)
    os.makedirs(args.output, exist_ok=True)
    for path in iter_images(args.input):
        img = img2array(imread(path))
        out = np.asarray(jit_apply(variables, jnp.asarray(img[None])))[0]
        base = os.path.splitext(os.path.basename(path))[0]
        imwrite(array2img(out),
                os.path.join(args.output, f"{base}_{args.suffix}.png"))
        print(f"{path} -> {base}_{args.suffix}.png")
