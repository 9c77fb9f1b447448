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


def resolve_mesh(opt: dict | None) -> Mesh:
    """Build the training mesh from YAML options.

    ``num_devices: auto`` (default) uses every visible device on the 'data'
    axis; an int restricts to the first N.  ``parallel: {fsdp: F}`` folds the
    devices into a (data, fsdp) 2-D mesh — stacked-trunk params shard over
    'fsdp' (weights-gathered data parallelism), batch stays on 'data'.
    This is the production replacement for the reference's unconditional DDP
    wrap (base_model.py:87-101): the mesh exists for every model and the CLI
    shards batches over it."""
    opt = opt or {}
    n = opt.get("num_devices", "auto")
    devices = list(jax.devices())
    if n not in (None, "auto"):
        n = int(n)
        assert 1 <= n <= len(devices), f"num_devices={n}, visible={len(devices)}"
        devices = devices[:n]
    fsdp = int((opt.get("parallel") or {}).get("fsdp", 1) or 1)
    if fsdp > 1:
        assert len(devices) % fsdp == 0, \
            f"parallel.fsdp={fsdp} must divide device count {len(devices)}"
        arr = np.asarray(devices).reshape(len(devices) // fsdp, fsdp)
        return Mesh(arr, ("data", "fsdp"))
    return Mesh(np.asarray(devices), ("data",))


def data_axis_size(mesh: Mesh) -> int:
    return int(mesh.shape.get("data", 1))


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


def host_to_global(v, sharding):
    """Host array -> mesh-sharded jax.Array.

    Single-process: plain (async) device_put.  Multi-process: each host
    passes only its LOCAL batch rows and the global array is assembled from
    the per-process shards (the DDP analogue of the reference's per-rank
    loaders, dist_util.py — each host feeds exactly its own devices, nothing
    is loaded twice or discarded)."""
    if jax.process_count() == 1:
        return jax.device_put(v, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(v))


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Put array leaves batch-sharded; non-arrays pass through.  Multi-host:
    leaves are per-process LOCAL rows (see host_to_global)."""
    sh = batch_sharding(mesh, axis_name)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and getattr(v, "ndim", 0) >= 1:
            out[k] = host_to_global(v, sh)
        else:
            out[k] = v
    return out
