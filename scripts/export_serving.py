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

Diffusion mode (--diffusion): --opt is a diffusion config (native or
reference OmegaConf schema), --ckpt the params .pkl a training run wrote,
and the exported function is the WHOLE one-shot SR pipeline — VAE encode of
the upscaled LQ, the full lax.scan sampler (--sampler ddpm|ddim|plms,
--steps N baked in statically), VAE decode — as (lq, seed) -> sr in [0,1].
Color fix (adain/wavelet) stays host-side, as in the test CLI.

  python scripts/export_serving.py --diffusion --opt cfg.yml --ckpt ckpt.pkl \
      --height 64 --width 64 --steps 20 --sampler ddim --dst sr.stablehlo --check
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
    ap.add_argument("--diffusion", action="store_true",
                    help="export the diffusion one-shot SR pipeline "
                         "(encode -> sampler scan -> decode)")
    ap.add_argument("--sampler", choices=["ddpm", "ddim", "plms"],
                    default="ddpm")
    ap.add_argument("--steps", type=int, default=50,
                    help="diffusion sampling steps (static, baked in)")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from ssl_tpu.archs import build_network

    if args.diffusion:
        _export_diffusion(args, jax, jnp, np)
        return

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


def _export_diffusion(args, jax, jnp, np):
    """One-shot diffusion SR pipeline -> StableHLO: (lq [0,1] NHWC, seed[1]
    uint32) -> sr [0,1].  The sampler's lax.scan (static --steps) exports as
    a bounded loop; the EMA/raw params the .pkl holds are baked in."""
    import yaml

    from ssl_tpu.diffusion.main import build_from_config
    from ssl_tpu.diffusion.sampler import (ddim_sample, plms_sample,
                                           spaced_ddpm_sample)

    with open(args.opt) as f:
        cfg = yaml.safe_load(f)
    model = build_from_config(cfg)
    state = model.init_state(gt_shape=(1, 64, 64, 3))
    with open(args.ckpt, "rb") as f:
        params = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
    vae_params = state.frozen["vae"]
    sampler = {"ddim": ddim_sample, "plms": plms_sample,
               "ddpm": spaced_ddpm_sample}[args.sampler]

    def apply_fn(x, t, ctx, z_lq):
        return model.apply_model(params, x, t, ctx, z_lq)

    def forward(lq, seed):
        lq_t = lq * 2.0 - 1.0
        r_enc, r_samp = jax.random.split(jax.random.key(seed[0]))
        z_lq = model.encode(vae_params, lq_t, r_enc)
        ctx = jnp.broadcast_to(params["null_context"],
                               (lq.shape[0],) + params["null_context"].shape)
        z = sampler(apply_fn, model.sched, z_lq.shape, rng=r_samp,
                    context=ctx, z_lq=z_lq, steps=args.steps)
        return jnp.clip((model.decode(vae_params, z) + 1.0) / 2.0, 0.0, 1.0)

    shapes = (jax.ShapeDtypeStruct((args.batch, args.height, args.width, 3),
                                   jnp.float32),
              jax.ShapeDtypeStruct((1,), jnp.uint32))
    from jax import export as jexport
    platforms = args.platform.split(",") if args.platform else None
    exp = jexport.export(jax.jit(forward), platforms=platforms)(*shapes)
    blob = exp.serialize()
    with open(args.dst, "wb") as f:
        f.write(blob)
    print(f"wrote {args.dst} ({len(blob) / 1e6:.2f} MB, diffusion "
          f"{args.sampler} x{args.steps}, input "
          f"{args.batch}x{args.height}x{args.width}x3 + seed, "
          f"platforms {exp.platforms})")

    if args.check:
        rng = np.random.RandomState(0)
        lq = rng.rand(args.batch, args.height, args.width, 3).astype(np.float32)
        seed = np.asarray([7], np.uint32)
        with open(args.dst, "rb") as f:
            back = jexport.deserialize(f.read())
        np.testing.assert_allclose(
            np.asarray(back.call(lq, seed)),
            np.asarray(forward(jnp.asarray(lq), jnp.asarray(seed))),
            rtol=1e-5, atol=1e-5)
        print("check: deserialized artifact matches the live pipeline")


if __name__ == "__main__":
    main()
