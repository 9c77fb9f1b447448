"""Diffusion-tree training CLI (reference surface: Diffusion-Based-SR/main.py).

Usage:
  python -m ssl_tpu.diffusion.main --train --base configs/SSL/base.yml
  # the reference's OmegaConf `target:`/`params:` configs are DROP-IN:
  python -m ssl_tpu.diffusion.main --train --base .../configs/SSL/base.yaml

The Lightning harness (DDP, accumulate_grad_batches, callbacks) maps to:
jitted train step + optax.MultiSteps accumulation + host degradation pipeline
+ orbax checkpoints + an image-logger dumping sample grids.  Reference-schema
files are lowered by ssl_tpu.diffusion.ref_config before building."""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import yaml


def build_from_config(cfg: dict):
    import jax
    from ssl_tpu.diffusion import (AutoencoderKL, DiffusionSSLConfig,
                                   EncoderUNetModelWT, StableSRSSL,
                                   UNetModelDualcondV2)
    from ssl_tpu.diffusion.ref_config import (is_reference_schema,
                                              translate_reference_config)
    from ssl_tpu.losses.ssl_loss import SSLSetting
    from ssl_tpu.ops.ssg import SSGConfig

    if is_reference_schema(cfg):
        cfg = translate_reference_config(cfg)
        if cfg.get("kind") == "cfw":
            raise SystemExit(
                "This is a CFW-decoder (AutoencoderKLResi) config — train it "
                "with: python -m ssl_tpu.diffusion.cfw_train --base <config>")
    m = cfg.get("model", {})
    sslopt = cfg.get("sslopt", {})

    # optional multi-chip mesh: `parallel: {data: D, tp: T}` — batch shards
    # over 'data', the UNet weights get tensor-parallel shardings over
    # 'model' (parallel/tensor.py).  Replaces the reference's Lightning DDP.
    par = cfg.get("parallel") or {}
    mesh = None
    if par:
        from ssl_tpu.parallel.tensor import create_dp_tp_mesh
        n_tp = int(par.get("tp", 1))
        n_data = int(par.get("data", max(1, len(jax.devices()) // n_tp)))
        if n_data * n_tp > 1:
            mesh = create_dp_tp_mesh(n_data, n_tp)

    def _zoo_strategy(s):
        # any non-default simself_strategy routes through the full zoo
        # (losses/simself_strategies.py); the shipped default stays on the
        # fast fused path
        strat = s.get("simself_strategy", "")
        return "" if strat in ("areaarea_mask_nonlocalavg_cuda_v1", "ssl_cuda") else strat

    def _zoo_opts(s):
        keys = ("simself_dh", "simself_dw", "kernel_size", "scaling_factor",
                "softmax_sr", "softmax_gt", "temperature", "crossentropy",
                "rearrange_back", "kernel_size_center", "mean", "var",
                "gene_type", "largest_k")
        return tuple((k, s[k]) for k in keys if k in s)
    dcfg = DiffusionSSLConfig(
        timesteps=m.get("timesteps", 1000),
        beta_schedule=m.get("beta_schedule", "linear"),
        linear_start=m.get("linear_start", 0.00085),
        linear_end=m.get("linear_end", 0.012),
        parameterization=m.get("parameterization", "eps"),
        scale_factor=m.get("scale_factor", 0.18215),
        pixel_weight=m.get("pixel_weight", 0.1),
        ssl_l1_weight=sslopt.get("l1_weight", 0.5),
        ssl_kl_weight=sslopt.get("kl_weight", 0.5),
        context_dim=m.get("context_dim", 1024),
        context_len=m.get("context_len", 77),
    )
    unet_cfg = {k: v for k, v in m.get("unet", {}).items() if k != "context_dim"}
    vae_cfg = dict(m.get("first_stage", {}))
    struct_cfg = dict(m.get("structcond") or {
        "model_channels": unet_cfg.get("model_channels", 256),
        "channel_mult": tuple(unet_cfg.get("channel_mult", (1, 1, 2, 2)))})
    if m.get("use_flash_attention"):
        # one switch for every attention in the pipeline (Pallas TPU kernel
        # on eligible shapes; einsum fallback elsewhere — ops/attention.py)
        for c in (unet_cfg, vae_cfg, struct_cfg):
            c.setdefault("use_flash_attention", True)
    if m.get("compute_dtype"):
        # one switch for bf16 activations across UNet + struct-cond + VAE
        # (params/norm-stats/outputs fp32 — unet.py/vae.py docstrings);
        # per-component override via model.unet.compute_dtype etc.
        for c in (unet_cfg, vae_cfg, struct_cfg):
            c.setdefault("compute_dtype", m["compute_dtype"])
    ssg = SSGConfig(search=sslopt.get("kernel_size_search", 25),
                    window=sslopt.get("kernel_size_window", 9),
                    sigma=sslopt.get("sigma", 0.004),
                    generalization=sslopt.get("generalization", True))
    model = StableSRSSL(
        dcfg,
        unet=UNetModelDualcondV2(context_dim=dcfg.context_dim, **unet_cfg),
        # struct encoder: own config block (reference structcond_stage_config,
        # configs/SSL/base.yaml:92-107); falls back to tracking the UNet dims
        # for small test configs
        structcond=EncoderUNetModelWT(**struct_cfg),
        vae=AutoencoderKL(**vae_cfg),
        ssl_setting=SSLSetting(ssg=ssg, mask_stride=sslopt.get("mask_stride", 3),
                               capacity=sslopt.get("capacity", 2048),
                               l1_weight=dcfg.ssl_l1_weight, kl_weight=dcfg.ssl_kl_weight,
                               impl=sslopt.get("impl", "dense"),
                               strategy=_zoo_strategy(sslopt),
                               strategy_opts=_zoo_opts(sslopt)),
        lr=cfg.get("train", {}).get("lr", 5e-5),
        accumulate=cfg.get("train", {}).get("accumulate_grad_batches", 1),
        vae_ckpt=m.get("vae_ckpt"),
        clip_text_ckpt=m.get("clip_text_ckpt"),
        text_prompt=m.get("text_prompt"),
        unet_ckpt=m.get("ckpt_path") or m.get("unet_ckpt"),
        mesh=mesh, zero=bool(par.get("zero", False)),
        zero_min_size=int(par.get("zero_min_size", 2 ** 14)))
    return model


def train(args):
    import cv2
    import jax
    import jax.numpy as jnp
    from ssl_tpu.data import build_dataloader, build_dataset
    from ssl_tpu.data.realesr_degradation import RealESRGANDegrader
    from ssl_tpu.utils.img_util import array2img

    with open(args.base) as f:
        cfg = yaml.safe_load(f)
    from ssl_tpu.diffusion.ref_config import (is_reference_schema,
                                              translate_reference_config)
    if is_reference_schema(cfg):
        cfg = translate_reference_config(cfg)
    if getattr(args, "overrides", None):
        cfg = apply_dotlist(cfg, args.overrides)
    model = build_from_config(cfg)

    data_cfg = cfg.get("data", {})
    gt_size = data_cfg.get("crop_size", 512)
    batch_size = data_cfg.get("batch_size", 2)
    dataset = build_dataset({**data_cfg.get("train", {}), "phase": "train",
                             "crop_size": gt_size})
    loader = build_dataloader(dataset, {"phase": "train",
                                        "batch_size_per_gpu": batch_size,
                                        "num_worker_per_gpu": data_cfg.get("num_workers", 4)})
    # queue_size > 0 enables the shuffled training-pair pool INCLUDING the
    # gt_mask (reference ddpmssl.py:296-339 queues lq/gt/mask together);
    # 0 (default) disables it
    degrader = RealESRGANDegrader(cfg.get("degradation", {}),
                                  scale=1,  # LQ stays at GT size (SR latent space)
                                  queue_size=cfg.get("degradation", {}).get("queue_size", 0))

    state = model.init_state(gt_shape=(batch_size, gt_size, gt_size, 3))
    # resume (reference main.py --resume / Lightning resume_from_checkpoint):
    # restores the FULL train state — params, EMA, optimizer, rng, step
    if getattr(args, "resume", None):
        import glob
        import pickle
        path = args.resume
        if path == "auto":
            cands = glob.glob(os.path.join(args.logdir, "train_state_*.pkl"))
            path = max(cands, key=lambda p: int(p.rsplit("_", 1)[1][:-4])) \
                if cands else None
        if path is None and args.resume == "auto":
            # orbax backend: 'latest' pointer next to state_orbax_<N> dirs
            latest = os.path.join(args.logdir, "latest")
            if os.path.exists(latest):
                with open(latest) as f:
                    path = os.path.join(args.logdir,
                                        f"state_orbax_{f.read().strip()}")
        if path and os.path.isdir(path):
            # orbax restore against the PLACED template: sharded (tp/ZeRO)
            # leaves restore straight into their mesh layout, no host gather
            import orbax.checkpoint as ocp
            state = model.place_state(state)
            state = ocp.StandardCheckpointer().restore(
                os.path.abspath(path), state)
            print(f"resumed (orbax) from {path} at step {int(state.step)}",
                  flush=True)
        elif path:
            import jax
            with open(path, "rb") as f:
                restored = pickle.load(f)
            state = jax.tree_util.tree_map(lambda _, r: jnp.asarray(r),
                                           state, restored)
            print(f"resumed from {path} at step {int(state.step)}", flush=True)
        elif args.resume != "auto":
            raise FileNotFoundError(args.resume)
    # pin the (possibly resumed) state to the mesh layout before stepping
    state = model.place_state(state)
    total_steps = cfg.get("train", {}).get("max_steps", 800000)
    log_every = cfg.get("train", {}).get("log_every", 100)
    save_every = cfg.get("train", {}).get("save_every", 1000)
    # Lightning ImageLogger parity (reference main.py:300-404, default
    # batch_frequency 1000): dump inputs/gt/reconstruction/pred_x0 grids
    image_every = cfg.get("train", {}).get("image_every", save_every)
    out_dir = args.logdir
    os.makedirs(out_dir, exist_ok=True)
    # Lightning tb logger parity (reference main.py trainer loggers): scalars
    # under losses/* at each log_every
    tb = None
    if cfg.get("train", {}).get("use_tb_logger"):
        from ssl_tpu.utils.logger import init_tb_logger
        tb = init_tb_logger(os.path.join(out_dir, "tb_logger"))

    def _dump_images(step, batch):
        imgs = model.preview(state, batch)
        img_dir = os.path.join(out_dir, "images", "train")
        os.makedirs(img_dir, exist_ok=True)
        for key, val in imgs.items():
            grid = np.concatenate(list(np.asarray(val)), axis=1)  # row of b
            bgr = (np.clip(grid, 0, 1)[..., ::-1] * 255.0).round().astype(np.uint8)
            cv2.imwrite(os.path.join(img_dir, f"{key}_gs-{step:06d}.png"), bgr)

    step = int(state.step)
    t0 = time.time()
    while step < total_steps:
        for batch in loader:
            if step >= total_steps:
                break
            # degrade on host: GT -> LQ at the same spatial size (scale 1 then
            # bicubic-up is how StableSR feeds 512-sized LQ)
            proc = degrader({k: v for k, v in batch.items()
                             if isinstance(v, np.ndarray)} | {"gt_size": gt_size})
            # no_degradation_prob (reference ddpmssl.py:237-238): occasionally
            # feed the clean GT as LQ (also the NaN fallback)
            ndp = cfg.get("degradation", {}).get("no_degradation_prob", 0.0)
            if (ndp and np.random.rand() < ndp) or np.isnan(proc["lq"]).any():
                proc = {**proc, "lq": proc["gt"]}
            device_batch = model.shard_batch(proc)
            state, logs = model.train_step(state, device_batch)
            step += 1
            if step % log_every == 0:
                host = {k: float(v) for k, v in logs.items()}
                print(f"step {step} ({(time.time()-t0)/log_every:.2f}s/it): {host}", flush=True)
                t0 = time.time()
                if tb is not None:
                    for k, v in host.items():
                        tb.add_scalar(f"losses/{k}", v, step)
            if image_every and step % image_every == 0:
                _dump_images(step, device_batch)
            if save_every and step % save_every == 0:
                import pickle
                # params-only ckpt (what test_cli consumes) + full train
                # state for --resume
                with open(os.path.join(out_dir, f"ckpt_{step}.pkl"), "wb") as f:
                    pickle.dump(jax.device_get(state.params), f)
                if cfg.get("train", {}).get("ckpt_backend") == "orbax":
                    # sharded-state-native: each chip writes its own shards —
                    # no host gather of a (potentially tp/ZeRO-sharded) state
                    import orbax.checkpoint as ocp
                    ckptr = ocp.StandardCheckpointer()
                    ckptr.save(os.path.abspath(
                        os.path.join(out_dir, f"state_orbax_{step}")),
                        state, force=True)
                    ckptr.wait_until_finished()
                    with open(os.path.join(out_dir, "latest"), "w") as f:
                        f.write(str(step))
                else:
                    with open(os.path.join(out_dir,
                                           f"train_state_{step}.pkl"), "wb") as f:
                        pickle.dump(jax.device_get(state), f)
    return state


def apply_dotlist(cfg: dict, dotlist: list[str]) -> dict:
    """OmegaConf-from_dotlist-style overrides (reference main.py:482,535:
    unknown CLI args ``a.b.c=value`` are merged over the config)."""
    for item in dotlist:
        if "=" not in item:
            raise SystemExit(f"override '{item}' is not of the form key=value")
        key, _, raw = item.partition("=")
        try:
            val = yaml.safe_load(raw)
        except yaml.YAMLError:
            val = raw
        if isinstance(val, str):
            # YAML 1.1 rejects '2e-4' style floats OmegaConf accepts
            try:
                val = float(val)
            except ValueError:
                pass
        node = cfg
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--base", type=str, required=True)
    parser.add_argument("--logdir", type=str, default="logs/diffusion_ssl")
    parser.add_argument("--resume", type=str, default=None,
                        help="'auto' (latest train_state_*.pkl in --logdir) "
                             "or an explicit train-state path")
    args, unknown = parser.parse_known_args()
    args.overrides = unknown
    if args.train:
        train(args)


if __name__ == "__main__":
    main()
