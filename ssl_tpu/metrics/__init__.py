"""Metric dispatcher (reference surface: metrics/__init__.py calculate_metric)."""
from copy import deepcopy

from ssl_tpu.utils.registry import METRIC_REGISTRY

from ssl_tpu.metrics import psnr_ssim as _ps  # noqa: F401
from ssl_tpu.metrics.psnr_ssim import calculate_psnr, calculate_ssim  # noqa: F401

# optional deep metrics register lazily on import
for _mod in ("niqe", "lpips_metric", "dists_metric", "fid", "clipiqa"):
    try:
        __import__(f"ssl_tpu.metrics.{_mod}")
    except Exception:  # gated on missing weights/pkgs
        pass


def calculate_metric(data: dict, opt: dict):
    """Dispatch on opt['type'], passing the rest as kwargs."""
    opt = deepcopy(opt)
    metric_type = opt.pop("type")
    opt.pop("better", None)
    return METRIC_REGISTRY.get(metric_type)(**data, **opt)
