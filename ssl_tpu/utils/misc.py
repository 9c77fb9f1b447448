"""Misc utilities (reference surface: utils/misc.py)."""

from __future__ import annotations

import os
import time

from ssl_tpu.data.data_util import scandir  # noqa: F401  (reference surface: misc.scandir)


def get_time_str() -> str:
    return time.strftime("%Y%m%d_%H%M%S", time.localtime())


def mkdir_and_rename(path: str) -> None:
    """mkdir; if it exists, archive the old one with a timestamp suffix
    (reference misc.py:24-35)."""
    if os.path.exists(path):
        new_name = path + "_archived_" + get_time_str()
        print(f"Path already exists. Rename it to {new_name}", flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def make_exp_dirs(opt: dict) -> None:
    """Create experiment/result dirs (reference misc.py:38-50)."""
    path_opt = dict(opt["path"])
    if opt.get("is_train"):
        mkdir_and_rename(path_opt.pop("experiments_root"))
    else:
        mkdir_and_rename(path_opt.pop("results_root"))
    for key, p in path_opt.items():
        if ("strict_load" in key or "pretrain_network" in key or
                "resume" in key or "param_key" in key or p is None):
            continue
        os.makedirs(p, exist_ok=True)


def check_resume(opt: dict, resume_iter: int) -> None:
    """When resuming, rewire pretrain paths to the resumed nets
    (reference misc.py:94-116)."""
    if not opt["path"].get("resume_state"):
        return
    networks = [key for key in opt.keys() if key.startswith("network_")]
    for network in networks:
        name = "pretrain_" + network
        basename = network.replace("network_", "net_")
        if opt["path"].get("ignore_resume_networks") and \
                network in opt["path"]["ignore_resume_networks"]:
            continue
        opt["path"][name] = os.path.join(
            opt["path"]["models"], f"{basename}_{resume_iter}.pkl")


def sizeof_fmt(size: float, suffix: str = "B") -> str:
    for unit in ("", "K", "M", "G", "T", "P"):
        if abs(size) < 1024.0:
            return f"{size:3.1f} {unit}{suffix}"
        size /= 1024.0
    return f"{size:3.1f} E{suffix}"
