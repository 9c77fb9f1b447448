"""Optional FSDP-style parameter sharding — beyond the reference's pure DDP.

The scanned trunk layouts (RRDBNet body, SwinIR pairs) stack per-block params
along a leading axis, which shards naturally over a second mesh axis: each
device holds 1/fsdp of every block stack and XLA all-gathers blocks on demand
(weights-gathered data parallelism).  SR generators are small, so this is a
scaling *option* (SURVEY §2.8 calls it a bonus, not a parity requirement) —
but it exercises the same mesh machinery bigger models need."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_2d_mesh(n_data: int, n_fsdp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_fsdp
    arr = np.asarray(devices[: n_data * n_fsdp]).reshape(n_data, n_fsdp)
    return Mesh(arr, ("data", "fsdp"))


def param_sharding_rule(path, leaf, mesh: Mesh, min_size: int = 2 ** 14):
    """Shard stacked-block leaves (leading axis divisible by fsdp) over 'fsdp';
    replicate everything else."""
    fsdp = mesh.shape["fsdp"]
    if (leaf.ndim >= 2 and leaf.shape[0] >= fsdp and leaf.shape[0] % fsdp == 0
            and leaf.size >= min_size):
        return NamedSharding(mesh, P("fsdp", *([None] * (leaf.ndim - 1))))
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Apply the rule across a param pytree."""
    def place(path, leaf):
        return jax.device_put(leaf, param_sharding_rule(path, leaf, mesh))
    return jax.tree_util.tree_map_with_path(place, params)


def shard_state(state, mesh: Mesh, min_size: int = 2 ** 14):
    """Shard a TrainState: params/opt-state leaves by the fsdp rule, batch-less
    scalars replicated.  Pass the result as donated input AND pin the step's
    out_shardings to the same tree to keep params resident-sharded."""
    def place(leaf):
        if hasattr(leaf, "ndim"):
            return jax.device_put(leaf, param_sharding_rule(None, leaf, mesh, min_size))
        return leaf
    return jax.tree_util.tree_map(place, state)


def batch_sharding_2d(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))
