"""Export a generator to a serialized StableHLO artifact for serving.

TPU-native deployment path: the jitted forward is captured with
``jax.export`` (StableHLO + VJP-free calling convention) at a fixed input
shape and written to one portable blob.  Any JAX runtime — CPU, GPU, or a
TPU serving binary via the PJRT C API — can ``jax.export.deserialize`` it
and call without Python model code or weights files (parameters are baked
in as constants).

  python scripts/export_serving.py --opt options/train/ESRGANSSL/train_ESRGANSSL_bicubic_x4.yml \
      --ckpt experiments/.../net_g_latest.pkl --height 128 --width 128 \
      --dst net_g_128x128.stablehlo [--check]

The reference has no serving story at all (torch .pth + python only).
"""

import argparse
import os
import pickle
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--opt", required=True, help="train/test YAML (network_g is used)")
    ap.add_argument("--ckpt", required=True, help=".pkl tree or reference .pth")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--key", default="params")
    ap.add_argument("--platform", default=None,
                    help="lowering platform(s), e.g. 'tpu' or 'cpu,tpu' "
                         "(default: the current backend)")
    ap.add_argument("--check", action="store_true",
                    help="deserialize the artifact and verify outputs match")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from ssl_tpu.archs import build_network

    if args.opt.endswith(".json"):
        from ssl_tpu.utils.options import parse_json_options
        opt = parse_json_options(args.opt)
        from ssl_tpu.utils.kair_options import is_kair_options, kair_to_opt
        if is_kair_options(opt):
            opt = kair_to_opt(opt)
    else:
        with open(args.opt) as f:
            opt = yaml.safe_load(f)
    net = build_network({**opt["network_g"], "scale": opt.get("scale", 4)})

    if args.ckpt.endswith((".pth", ".pt")):
        from ssl_tpu.utils.weight_port import load_params_auto
        params = load_params_auto(args.ckpt, param_key=args.key)
        if params is None:
            raise SystemExit(f"no converter matched {args.ckpt}")
    else:
        with open(args.ckpt, "rb") as f:
            payload = pickle.load(f)
        params = payload.get(args.key, payload) if isinstance(payload, dict) else payload
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def forward(x):
        return net.apply({"params": params}, x)

    shape = jax.ShapeDtypeStruct((args.batch, args.height, args.width, 3),
                                 jnp.float32)
    from jax import export as jexport
    platforms = args.platform.split(",") if args.platform else None
    exp = jexport.export(jax.jit(forward), platforms=platforms)(shape)
    blob = exp.serialize()
    with open(args.dst, "wb") as f:
        f.write(blob)
    print(f"wrote {args.dst} ({len(blob) / 1e6:.2f} MB, input "
          f"{args.batch}x{args.height}x{args.width}x3, "
          f"platforms {exp.platforms})")

    if args.check:
        rng = np.random.RandomState(0)
        x = rng.rand(args.batch, args.height, args.width, 3).astype(np.float32)
        with open(args.dst, "rb") as f:
            back = jexport.deserialize(f.read())
        np.testing.assert_allclose(np.asarray(back.call(x)),
                                   np.asarray(forward(jnp.asarray(x))),
                                   rtol=1e-5, atol=1e-5)
        print("check: deserialized artifact matches the live forward")


if __name__ == "__main__":
    main()
