"""Device mesh + sharding utilities — the DDP/NCCL replacement (SURVEY §2.8).

The reference's only parallelism is data-parallel DDP over NCCL
(base_model.py:95-101, dist_util.py).  Here: a 1-D ``Mesh`` over all devices
with the batch sharded on the 'data' axis and parameters replicated; XLA
inserts the gradient all-reduces over ICI.  Multi-host launch is
``jax.distributed.initialize()`` + per-host input pipelines
(EnlargedSampler(rank=process_index))."""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def get_dist_info() -> tuple[int, int]:
    """(rank, world_size) — process-level, for data sharding / rank-0 gating."""
    return jax.process_index(), jax.process_count()


def master_only(func):
    """Run only on process 0 (reference dist_util.py:74-82 decorator)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if jax.process_index() == 0:
            return func(*args, **kwargs)
    return wrapper


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Device-put array leaves batch-sharded; non-arrays pass through."""
    sh = batch_sharding(mesh, axis_name)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out
