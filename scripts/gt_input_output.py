"""Dump (GT, model input, model output) triplets for CFW-decoder training data
(reference surface: Diffusion-Based-SR/scripts/gt_input_output.py:1-335 +
configs/GT_input_output/).

For each GT image: synthesize the degraded input, run the diffusion sampler,
and save the reference SingleImageNPDataset layout —
``outdir/{gts,inputs,latents,samples}`` (basicsr/data/
single_image_dataset.py:76-121): the stage-1 LATENT as .npy (what the CFW
decoder actually consumes, descaled at train time like the reference's
``latent / 0.18215``) plus the decoded sample image for verification.  The
CFW trainer (``python -m ssl_tpu.diffusion.cfw_train``) reads this root
directly."""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import yaml


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--gt_dir", required=True)
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--ddpm_steps", type=int, default=200)
    parser.add_argument("--n_images", type=int, default=0, help="0 = all")
    args = parser.parse_args()

    import cv2
    import jax
    # honor an explicit JAX_PLATFORMS env: the image's site hook imports jax
    # pinned to its own platform BEFORE this script runs, so the env var alone
    # is ignored — the config update is what actually switches the backend
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    from ssl_tpu.data.realesr_degradation import RealESRGANDegrader
    from ssl_tpu.data.realesrgan_dataset import _KernelSynth
    from ssl_tpu.diffusion.main import build_from_config
    from ssl_tpu.diffusion.sampler import spaced_ddpm_sample
    from ssl_tpu.utils.img_util import array2img, img2array, imread, imwrite

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    model = build_from_config(cfg)
    state = model.init_state(gt_shape=(1, 64, 64, 3))
    with open(args.ckpt, "rb") as f:
        params = pickle.load(f)
    state = state.replace(params=jax.tree_util.tree_map(jnp.asarray, params))
    vae_params = state.frozen["vae"]

    for sub in ("gts", "inputs", "latents", "samples"):
        os.makedirs(os.path.join(args.outdir, sub), exist_ok=True)

    synth = _KernelSynth({})
    degrader = RealESRGANDegrader(cfg.get("degradation", {}), scale=1, queue_size=0)
    degrader.pool = None
    rng = jax.random.PRNGKey(0)

    names = sorted(os.listdir(args.gt_dir))
    if args.n_images:
        names = names[: args.n_images]
    for name in names:
        gt = img2array(imread(os.path.join(args.gt_dir, name)))
        size = min(gt.shape[0], gt.shape[1]) // 64 * 64
        gt = gt[:size, :size]
        k1, k2, sinc = synth.sample()
        lq = degrader.degrade_batch(gt[None], [k1], [k2], [sinc])[0]
        lq_up = cv2.resize(lq, (size, size), interpolation=cv2.INTER_CUBIC)

        rng, r_enc, r_samp = jax.random.split(rng, 3)
        z_lq = model.encode(vae_params, jnp.asarray(lq_up[None] * 2 - 1), r_enc)
        infer_p = model.infer_params(state)  # EMA at sampling time (LitEma)
        ctx = jnp.broadcast_to(infer_p["null_context"],
                               (1,) + infer_p["null_context"].shape)

        def apply_fn(x, t, c, z):
            return model.apply_model(infer_p, x, t, c, z)

        z = spaced_ddpm_sample(apply_fn, model.sched, z_lq.shape, r_samp, ctx, z_lq,
                               steps=args.ddpm_steps)
        out = np.asarray(model.decode(vae_params, z))[0]
        out = np.clip((out + 1) / 2, 0, 1).astype(np.float32)

        imwrite(array2img(gt), os.path.join(args.outdir, "gts", name))
        imwrite(array2img(lq_up), os.path.join(args.outdir, "inputs", name))
        stem = os.path.splitext(name)[0]
        np.save(os.path.join(args.outdir, "latents", stem + ".npy"),
                np.asarray(z)[0])
        imwrite(array2img(out), os.path.join(args.outdir, "samples", name))
        print(name)


if __name__ == "__main__":
    main()
