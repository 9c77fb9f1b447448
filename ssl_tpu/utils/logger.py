"""Logging: message logger, tensorboard, timers (reference: utils/logger.py)."""

from __future__ import annotations

import datetime
import logging
import time


class AvgTimer:
    """Sliding-average iteration/data timer (reference logger.py:10-43)."""

    def __init__(self, window: int = 200):
        self.window = window
        self.current_time = 0.0
        self.total_time = 0.0
        self.count = 0
        self.avg_time = 0.0
        self.start()

    def start(self):
        self.start_time = self.tic = time.time()

    def record(self):
        self.count += 1
        self.toc = time.time()
        self.current_time = self.toc - self.tic
        self.total_time += self.current_time
        self.avg_time = self.total_time / self.count
        if self.count > self.window:
            self.count = 0
            self.total_time = 0
        self.tic = time.time()

    def get_current_time(self):
        return self.current_time

    def get_avg_time(self):
        return self.avg_time


class MessageLogger:
    """Console/training-log formatter (reference logger.py:45-115):
    [name..][epoch, iter, lr] [eta, time (data)] l_*: values"""

    def __init__(self, opt: dict, start_iter: int = 1, tb_logger=None):
        self.exp_name = opt["name"]
        logger_opt = opt.get("logger") or {}
        self.interval = logger_opt.get("print_freq", 100)
        self.start_iter = start_iter
        self.max_iters = (opt.get("train") or {}).get("total_iter", 0)
        self.use_tb_logger = logger_opt.get("use_tb_logger", False)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def reset_start_time(self):
        self.start_time = time.time()

    def __call__(self, log_vars: dict):
        current_iter = log_vars.pop("iter")
        epoch = log_vars.pop("epoch", 0)
        lrs = log_vars.pop("lrs", [])

        message = f"[{self.exp_name[:5]}..][epoch:{epoch:3d}, iter:{current_iter:8,d}, lr:("
        message += ",".join(f"{v:.3e}" for v in lrs) + ")] "

        if "time" in log_vars:
            iter_time = log_vars.pop("time")
            data_time = log_vars.pop("data_time", 0.0)
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / max(current_iter - self.start_iter + 1, 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += f"[eta: {eta_str}, time (data): {iter_time:.3f} ({data_time:.3f})] "

        for k, v in log_vars.items():
            message += f"{k}: {v:.4e} "
            if self.tb_logger is not None and self.use_tb_logger:
                tag = f"losses/{k}" if k.startswith("l_") else k
                self.tb_logger.add_scalar(tag, v, current_iter)
        self.logger.info(message)


def init_tb_logger(log_dir: str):
    from tensorboardX import SummaryWriter
    return SummaryWriter(log_dir=log_dir)


def init_wandb_logger(opt: dict):
    """Optional W&B sync (reference logger.py:119-143: requires tb on;
    gated on the wandb package being available)."""
    try:
        import wandb
    except ImportError:
        get_root_logger().warning("wandb is not installed; skipping wandb logger.")
        return None
    logger = get_root_logger()
    project = (opt.get("logger", {}).get("wandb") or {}).get("project")
    resume_id = (opt.get("logger", {}).get("wandb") or {}).get("resume_id")
    if not project:
        return None
    if resume_id:
        wandb.init(id=resume_id, resume="allow", name=opt["name"], config=opt,
                   project=project, sync_tensorboard=True)
    else:
        wandb.init(name=opt["name"], config=opt, project=project, sync_tensorboard=True)
    logger.info(f"Use wandb logger with id={wandb.run.id}; project={project}.")
    return wandb.run


_initialized_loggers = set()


def get_root_logger(logger_name: str = "ssl_tpu", log_level=logging.INFO, log_file: str | None = None):
    logger = logging.getLogger(logger_name)
    if logger_name in _initialized_loggers:
        return logger
    fmt = "%(asctime)s %(levelname)s: %(message)s"
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter(fmt))
    logger.addHandler(sh)
    logger.propagate = False
    import jax
    try:
        rank = jax.process_index()
    except Exception:
        rank = 0
    if rank != 0:
        logger.setLevel(logging.ERROR)
    else:
        logger.setLevel(log_level)
        if log_file is not None:
            fh = logging.FileHandler(log_file, "w")
            fh.setFormatter(logging.Formatter(fmt))
            logger.addHandler(fh)
    _initialized_loggers.add(logger_name)
    return logger


def get_env_info() -> str:
    import jax
    import ssl_tpu
    msg = ("\nVersion Information:"
           f"\n\tssl_tpu: {ssl_tpu.__version__}"
           f"\n\tjax: {jax.__version__}"
           f"\n\tdevices: {jax.devices()}")
    return msg
