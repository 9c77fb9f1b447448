"""Training pipeline CLI (reference surface: basicsr/train.py).

Usage:  python -m ssl_tpu.train -opt options/train/ESRGANSSL/train_x4.yml

Flow (reference train.py:91-215, TPU-adapted):
  parse YAML -> jax.distributed init (multi-host) -> seed -> dataloaders
  (per-host shard via EnlargedSampler) -> build_model -> init/resume state ->
  jitted epoch/iter loop with threaded prefetch -> periodic log/val/save.
"""

from __future__ import annotations

import math
import os
import time

import jax
import numpy as np

from ssl_tpu.data import build_dataloader, build_dataset
from ssl_tpu.data.loader import EnlargedSampler
from ssl_tpu.models import build_model
from ssl_tpu.utils.logger import AvgTimer, MessageLogger, get_env_info, get_root_logger, init_tb_logger
from ssl_tpu.utils.options import copy_opt_file, dict2str, parse_options


def create_train_val_dataloader(opt, logger, n_data_shards: int = 1):
    """Per-host loaders.  The host-local train batch is
    ``batch_size_per_gpu × n_data_shards`` (reference semantics: per-GPU batch
    × local devices; base_model.py:87-101 wraps every net in DDP, so the
    global batch there is batch_size_per_gpu × world — same formula here with
    chips in place of GPUs)."""
    train_loader, val_loaders = None, []
    rank, world = jax.process_index(), jax.process_count()
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train":
            dataset_enlarge_ratio = dataset_opt.get("dataset_enlarge_ratio", 1)
            train_set = build_dataset(dataset_opt)
            sampler = EnlargedSampler(len(train_set), world, rank, dataset_enlarge_ratio)
            # each HOST loads only the rows for its own devices: the global
            # batch is bpg × n_data_shards (the mesh 'data' width, spanning
            # all processes), assembled from per-process shards in
            # host_to_global — the DDP per-rank-loader semantics
            assert n_data_shards % world == 0, \
                f"data shards {n_data_shards} not divisible by processes {world}"
            local_shards = n_data_shards // world
            local_opt = dict(dataset_opt)
            local_opt["batch_size_per_gpu"] = \
                dataset_opt["batch_size_per_gpu"] * local_shards
            train_loader = build_dataloader(train_set, local_opt, sampler=sampler,
                                            seed=opt["manual_seed"])
            if len(train_loader) == 0:
                raise ValueError(
                    f"dataset ({len(train_set)} imgs × enlarge "
                    f"{dataset_enlarge_ratio}) smaller than the host-local "
                    f"batch {local_opt['batch_size_per_gpu']} "
                    f"(batch_size_per_gpu × {local_shards} local data shards) "
                    "— set dataset_enlarge_ratio or num_devices.")
            num_iter_per_epoch = math.ceil(
                len(train_set) * dataset_enlarge_ratio /
                (dataset_opt["batch_size_per_gpu"] * n_data_shards))
            total_iters = int(opt["train"]["total_iter"])
            total_epochs = math.ceil(total_iters / num_iter_per_epoch)
            logger.info("Training statistics:"
                        f"\n\tNumber of train images: {len(train_set)}"
                        f"\n\tBatch size per device: {dataset_opt['batch_size_per_gpu']}"
                        f"\n\tLocal data shards (mesh): {n_data_shards}"
                        f"\n\tWorld size (processes): {world}"
                        f"\n\tRequire iter per epoch: {num_iter_per_epoch}"
                        f"\n\tTotal epochs: {total_epochs}; iters: {total_iters}.")
        elif phase.split("_")[0] == "val":
            val_set = build_dataset(dataset_opt)
            val_loaders.append(build_dataloader(val_set, dataset_opt))
        else:
            raise ValueError(f"Dataset phase {phase} is not recognized.")
    return train_loader, val_loaders, total_epochs, total_iters


def train_pipeline(root_path: str, args=None):
    from ssl_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    opt, parsed = parse_options(root_path, is_train=True, args=args)
    if (getattr(parsed, "launcher", "none") == "jax"
            or opt.get("num_processes", 1) > 1
            or os.environ.get("JAX_NUM_PROCESSES")):
        # explicit env args (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
        # JAX_PROCESS_ID) support manual multi-host launches — the analogue of
        # the reference's MASTER_ADDR/RANK torch launch (dist_util.py:28-57);
        # without them initialize() auto-detects (TPU pods, SLURM, MPI)
        env = os.environ
        jax.distributed.initialize(
            coordinator_address=env.get("JAX_COORDINATOR_ADDRESS"),
            num_processes=(int(env["JAX_NUM_PROCESSES"])
                           if env.get("JAX_NUM_PROCESSES") else None),
            process_id=(int(env["JAX_PROCESS_ID"])
                        if env.get("JAX_PROCESS_ID") else None))

    seed = opt["manual_seed"] + jax.process_index()
    np.random.seed(seed)
    import random
    random.seed(seed)

    os.makedirs(opt["path"]["experiments_root"], exist_ok=True)
    os.makedirs(opt["path"]["models"], exist_ok=True)
    os.makedirs(opt["path"]["training_states"], exist_ok=True)
    copy_opt_file(parsed.opt, opt["path"]["experiments_root"])

    log_file = os.path.join(opt["path"]["log"], f"train_{opt['name']}_{int(time.time())}.log")
    logger = get_root_logger(log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))
    tb_logger = None
    if (opt.get("logger") or {}).get("use_tb_logger") and jax.process_index() == 0:
        tb_logger = init_tb_logger(os.path.join(opt["path"]["experiments_root"], "tb_logger"))

    # model first: its mesh (num_devices / parallel.fsdp from YAML) decides the
    # host-local batch size.  This is the production multi-chip path — the
    # round-1 gap where only the dryrun ever created a mesh is closed here.
    model = build_model(opt)
    n_data = model.n_data_shards
    logger.info(f"Device mesh: {dict(model.mesh.shape)} over "
                f"{model.mesh.size} device(s)")

    train_loader, val_loaders, total_epochs, total_iters = \
        create_train_val_dataloader(opt, logger, n_data_shards=n_data)

    gt_size = opt["datasets"]["train"].get("gt_size", 128)
    batch_size = opt["datasets"]["train"]["batch_size_per_gpu"] * n_data
    lq_size = gt_size // opt.get("scale", 4)
    state = model.init_state(lq_shape=model.train_init_shape(batch_size, lq_size))

    start_epoch, current_iter = 0, 0
    if opt["path"].get("resume_state") or opt.get("auto_resume"):
        latest = model.find_latest_state(opt["path"]["training_states"])
        if latest is not None:
            state, current_iter = model.load_training_state(
                state, opt["path"]["training_states"], latest)
            logger.info(f"Resuming training from iter {current_iter}.")
            start_epoch = current_iter // max(len(train_loader), 1)

    msg_logger = MessageLogger(opt, current_iter, tb_logger)
    iter_timer, data_timer = AvgTimer(), AvgTimer()
    logger.info(f"Start training from epoch: {start_epoch}, iter: {current_iter}")
    val_freq = (opt.get("val") or {}).get("val_freq")
    save_freq = (opt.get("logger") or {}).get("save_checkpoint_freq")
    print_freq = (opt.get("logger") or {}).get("print_freq", 100)

    from ssl_tpu.data.loader import device_prefetch
    from ssl_tpu.parallel.mesh import batch_sharding
    prec = (opt.get("train") or {}).get("matmul_precision")
    if prec:
        jax.config.update("jax_default_matmul_precision", prec)
    # pin the state layout (replicated / fsdp-sharded) and stream batches
    # straight into the data-sharded layout; XLA all-reduces grads over ICI
    state = model.place_state(state)
    batch_sh = batch_sharding(model.mesh) if model.mesh.size > 1 else None
    epoch = start_epoch
    while current_iter < total_iters:
        train_loader.set_epoch(epoch)
        for batch in device_prefetch(train_loader, sharding=batch_sh):
            data_timer.record()
            if current_iter >= total_iters:
                break
            current_iter += 1
            # host-side degradation recipes (RealESRGAN/BSRGAN) prepare here
            if hasattr(model, "prepare_batch") and "lq" not in batch:
                host = {k: (np.asarray(v) if not isinstance(v, (list, str)) else v)
                        for k, v in batch.items()}
                batch = {k: v for k, v in model.prepare_batch(host).items()
                         if not isinstance(v, (list, str))}
                batch = model.shard(batch)
            device_batch = {k: v for k, v in batch.items()
                            if not isinstance(v, (list, str))}
            state, logs = model.train_step(state, device_batch)
            iter_timer.record()
            if current_iter == 1:
                msg_logger.reset_start_time()
            if current_iter % print_freq == 0:
                host_logs = {k: float(v) for k, v in logs.items()}
                lr = host_logs.pop("lr", 0.0)
                msg_logger({"iter": current_iter, "epoch": epoch, "lrs": [lr],
                            "time": iter_timer.get_avg_time(),
                            "data_time": data_timer.get_avg_time(), **host_logs})
            if save_freq and current_iter % int(save_freq) == 0:
                # all processes enter (device_get is collective-stream-
                # ordered); file writes are rank-0-gated inside
                if jax.process_index() == 0:
                    logger.info("Saving models and training states.")
                model.save_networks(state, opt["path"]["models"], current_iter)
                model.save_training_state(state, opt["path"]["training_states"], epoch, current_iter)
            if val_freq and current_iter % int(val_freq) == 0:
                # validation is a COLLECTIVE program when params live on a
                # multi-process mesh (the jitted forward spans all hosts), so
                # every process must run it — only rank 0 logs and writes
                # images (a rank-0-only gate here deadlocks rank 0 against
                # peers that already moved on)
                rank0 = jax.process_index() == 0
                for val_loader in val_loaders:
                    metrics = model.validation(
                        state, val_loader, current_iter,
                        tb_logger if rank0 else None,
                        (opt.get("val") or {}).get("save_img", False) and rank0)
                    if rank0:
                        logger.info(f"Validation {val_loader.dataset.opt.get('name')}: {metrics}")
            data_timer.start()
            iter_timer.start()
        epoch += 1

    logger.info("End of training.")
    model.save_networks(state, opt["path"]["models"], current_iter)
    model.save_training_state(state, opt["path"]["training_states"], epoch, current_iter)
    return state


def main():
    """Console-script entry (`ssl-train -opt ...`)."""
    train_pipeline(os.getcwd())


if __name__ == "__main__":
    main()
