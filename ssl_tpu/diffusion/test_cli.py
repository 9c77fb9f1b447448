"""Diffusion-tree inference CLI (reference surface: Diffusion-Based-SR/test.py).

Loads a trained diffusion state (+ optional CFW VQGAN), runs spaced-DDPM
sampling (default 200 steps) conditioned on the LQ latent, decodes, and writes
three color-fix variants: nofix / adain / wavelet (reference test.py:322-341)."""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np
import yaml


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--init-img", dest="init_img", required=True, help="LQ folder")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--ddpm_steps", type=int, default=200)
    parser.add_argument("--upscale", type=float, default=4.0)
    parser.add_argument("--colorfix_type", choices=["nofix", "adain", "wavelet"],
                        default="adain")
    parser.add_argument("--vqgan_ckpt", default=None,
                        help="CFW decoder params pickle (diffusion/cfw_train.py "
                             "save_cfw_params); decodes with LQ-feature fusion "
                             "like reference test.py's separate VQGAN ckpt")
    parser.add_argument("--tile_latent", type=int, default=0, help="latent tile size (0=off)")
    parser.add_argument("--tile_parallel", action="store_true",
                        help="diffuse canvas tiles concurrently, one per device "
                             "(1-D data mesh; reference processes tiles serially)")
    parser.add_argument("--tp", type=int, default=0,
                        help="tensor-parallel sampling: shard the UNet "
                             "weights over an N-device 'model' mesh "
                             "(parallel/tensor.py Megatron rules); the "
                             "sampler jits as one SPMD program")
    parser.add_argument("--prompt", default=None,
                        help="conditioning text (requires model.clip_text_ckpt "
                             "in the config; default: the trained fixed "
                             "context — '' for the shipped SSL configs)")
    parser.add_argument("--sampler", choices=["ddpm", "ddim", "plms"],
                        default="ddpm",
                        help="spaced ancestral DDPM (reference test.py "
                             "default), DDIM (eta 0), or PLMS "
                             "(reference ldm/models/diffusion/plms.py)")
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from ssl_tpu.diffusion.main import build_from_config
    from ssl_tpu.diffusion.sampler import (ddim_sample, plms_sample,
                                           spaced_ddpm_sample, tiled_sample)
    from ssl_tpu.diffusion.color_fix import adain_color_fix, wavelet_color_fix
    from ssl_tpu.utils.img_util import array2img, img2array, imread, imwrite

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    model = build_from_config(cfg)
    state = model.init_state(gt_shape=(1, 64, 64, 3))
    with open(args.ckpt, "rb") as f:
        params = pickle.load(f)
    state = state.replace(params=jax.tree_util.tree_map(jnp.asarray, params))

    os.makedirs(args.outdir, exist_ok=True)
    vae_params = state.frozen["vae"]
    cfw = None
    if args.vqgan_ckpt:
        from ssl_tpu.diffusion.vae import AutoencoderKLResi
        fs_cfg = cfg.get("model", {}).get("first_stage", {}) or {}
        cfw_net = AutoencoderKLResi(**fs_cfg)
        with open(args.vqgan_ckpt, "rb") as f:
            cfw_params = pickle.load(f)["params"]
        cfw = (cfw_net, jax.tree_util.tree_map(jnp.asarray, cfw_params))
    rng = jax.random.PRNGKey(42)
    infer_p = model.infer_params(state)  # EMA at sampling time (LitEma)

    tp_mesh = None
    if args.tp and args.tp > 1:
        # tensor-parallel sampling: UNet/structcond weights Megatron-sharded
        # over a 1 x tp (data, model) mesh; everything else replicated on the
        # same mesh so eager ops never mix device sets
        from ssl_tpu.parallel.tensor import (create_dp_tp_mesh,
                                             state_tp_shardings)
        tp_mesh = create_dp_tp_mesh(1, args.tp)
        infer_p = jax.device_put(infer_p, state_tp_shardings(infer_p, tp_mesh))
        vae_params = jax.device_put(
            vae_params, state_tp_shardings(vae_params, tp_mesh))
        if cfw is not None:
            cfw = (cfw[0], jax.device_put(
                cfw[1], state_tp_shardings(cfw[1], tp_mesh)))

    def apply_fn(x, t, ctx, z_lq):
        return model.apply_model(infer_p, x, t, ctx, z_lq)

    for name in sorted(os.listdir(args.init_img)):
        path = os.path.join(args.init_img, name)
        lq = img2array(imread(path))
        h, w = lq.shape[:2]
        up_h = int(h * args.upscale) // 64 * 64
        up_w = int(w * args.upscale) // 64 * 64
        lq_up = cv2.resize(lq, (up_w, up_h), interpolation=cv2.INTER_CUBIC)
        lq_t = jnp.asarray(lq_up[None] * 2 - 1)

        rng, r_enc, r_samp = jax.random.split(rng, 3)
        z_lq = model.encode(vae_params, lq_t, r_enc)
        if args.prompt is not None:
            # nonempty text conditioning (reference sr_val scripts pass the
            # prompt through FrozenOpenCLIPEmbedder; same tower here)
            if not model.clip_text_ckpt:
                raise SystemExit("--prompt needs model.clip_text_ckpt in the "
                                 "config (the CLIP text tower weights)")
            ctx = jnp.asarray(model.encode_text([args.prompt]))
        else:
            ctx = jnp.broadcast_to(infer_p["null_context"],
                                   (1,) + infer_p["null_context"].shape)

        def sample_tile(z_tile):
            # batch-agnostic: --tile_parallel stacks tiles along batch
            c = ctx if ctx is None or ctx.shape[0] == z_tile.shape[0] else \
                jnp.concatenate([ctx] * (z_tile.shape[0] // ctx.shape[0]), axis=0)
            kw = dict(rng=r_samp, context=c, z_lq=z_tile, steps=args.ddpm_steps)
            if args.sampler == "ddim":
                return ddim_sample(apply_fn, model.sched, z_tile.shape, **kw)
            if args.sampler == "plms":
                return plms_sample(apply_fn, model.sched, z_tile.shape, **kw)
            return spaced_ddpm_sample(apply_fn, model.sched, z_tile.shape, **kw)

        if tp_mesh is not None:
            # one SPMD program: GSPMD partitions every UNet matmul over
            # 'model' per the weight shardings
            sample_tile = jax.jit(sample_tile)

        if args.tile_latent and (z_lq.shape[1] > args.tile_latent or
                                 z_lq.shape[2] > args.tile_latent):
            z = tiled_sample(sample_tile, z_lq, args.tile_latent,
                             args.tile_latent // 4,
                             data_parallel=args.tile_parallel)
        else:
            z = sample_tile(z_lq)
        if cfw is not None:
            cfw_net, cfw_params = cfw
            _, _, feas = cfw_net.apply({"params": cfw_params}, lq_t,
                                       method=cfw_net.encode)
            img = np.asarray(cfw_net.apply(
                {"params": cfw_params}, z / model.cfg.scale_factor, feas,
                method=cfw_net.decode))[0]
        else:
            img = np.asarray(model.decode(vae_params, z))[0]
        img = np.clip((img + 1) / 2, 0, 1).astype(np.float32)
        if args.colorfix_type == "adain":
            img = adain_color_fix(img, lq_up)
        elif args.colorfix_type == "wavelet":
            img = wavelet_color_fix(img, lq_up)
        out_path = os.path.join(args.outdir, name)
        imwrite(array2img(img), out_path)
        print(f"{path} -> {out_path}")


if __name__ == "__main__":
    main()
