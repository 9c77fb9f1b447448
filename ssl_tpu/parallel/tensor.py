"""Tensor parallelism for the diffusion UNet stack — GSPMD weight annotations.

The reference's Lightning/DDP setup (Diffusion-Based-SR/main.py) is pure
data-parallel: every GPU holds the full 865M-param StableSR UNet.  On TPU the
idiomatic scale-out for a model this shape is a 2-D ``(data, model)`` mesh with
Megatron-style tensor parallelism INSIDE each block, expressed as
``jax.sharding`` annotations on the weights and left to XLA's SPMD partitioner
to propagate — no hand-written collectives:

- **column-parallel** (shard the OUT feature dim): ResBlock ``in_layers_2``
  conv + the ``emb_layers_1`` time-embedding Dense that adds onto its output,
  attention ``to_q/to_k/to_v`` and the struct encoder's packed ``qkv``
  (head-major packing: a contiguous shard of the 3c dim is a whole head
  group when tp divides num_heads), SPADE's ``mlp_shared_0``.
- **row-parallel** (shard the IN feature dim; XLA inserts the psum):
  ResBlock ``out_layers_3``, attention ``to_out_0`` / the struct encoder's
  ``proj_out``, SPADE's ``mlp_gamma``/``mlp_beta``.
- the GroupNorm between the column- and row-parallel convs
  (``out_layers_0``) keeps its activations channel-sharded: its 32 groups are
  contiguous channel blocks, so whenever tp divides 32 every group's
  statistics are shard-local (scale/bias shard along the channel dim).
- everything else (skip 1x1s, up/downsample convs, the GEGLU ff whose two
  halves are interleaved slices of one output dim, LayerNorms, time_embed,
  the frozen VAE) stays replicated; activations between blocks carry only the
  ``data`` batch sharding.

Correctness does not depend on the divisibility notes above — GSPMD computes
the same values under any sharding, inserting reshards where an annotation
doesn't divide; the rules below simply fall back to replicated when a dim is
not divisible so the compiled program stays collective-minimal.

The rules are *path-name based*, so one function covers ``state.params``,
``state.ema_params`` and the optimizer moments (optax's mu/nu mirror the
params tree, names included).  ``proj_out`` is row-parallel only under the
``structcond`` subtree (AttentionBlockQKV, head-sharded input); the UNet's
SpatialTransformerV2 ``proj_out`` consumes the replicated post-ff stream and
stays replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# module names whose `kernel` shards on the OUT feature dim (last axis)
_COL_MODULES = ("in_layers_2", "emb_layers_1", "spade_mlp_shared_0", "qkv")
_COL_SUFFIXES = ("_to_q", "_to_k", "_to_v")
# module names whose `kernel` shards on the IN feature dim
_ROW_MODULES = ("out_layers_3", "spade_mlp_gamma", "spade_mlp_beta")
_ROW_SUFFIXES = ("_to_out_0",)


def create_dp_tp_mesh(n_data: int, n_tp: int, devices=None) -> Mesh:
    """2-D (data, model) mesh. model = tensor-parallel axis."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_tp
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_tp),
                ("data", "model"))


def _path_names(path) -> list[str]:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return out


def tp_spec(names: list[str], shape, tp: int, axis: str = "model") -> P:
    """Megatron partition spec for one leaf; P() (replicated) by default."""
    if not shape or ("unet" not in names and "structcond" not in names):
        return P()
    name = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    is_col = parent in _COL_MODULES or parent.endswith(_COL_SUFFIXES)
    is_row = (parent in _ROW_MODULES or parent.endswith(_ROW_SUFFIXES)
              or (parent == "proj_out" and "structcond" in names))
    if name == "kernel":
        if is_col and shape[-1] % tp == 0:
            return P(*([None] * (len(shape) - 1)), axis)
        if is_row and len(shape) >= 2 and shape[-2] % tp == 0:
            spec = [None] * len(shape)
            spec[-2] = axis          # dense (in,out) / conv (kh,kw,in,out)
            return P(*spec)
    elif name in ("bias", "scale"):
        # column bias shards with its out dim; so does the mid-block
        # GroupNorm operating on the channel-sharded stream
        if (is_col or parent == "out_layers_0") and shape[0] % tp == 0:
            return P(axis)
    return P()


def state_tp_shardings(state, mesh: Mesh, axis: str = "model",
                       zero: bool = False, zero_min_size: int = 2 ** 14):
    """NamedSharding pytree for a DiffusionTrainState (or any pytree whose
    tensor-parallel leaves live under 'unet'/'structcond' path components).

    ``zero=True`` adds ZeRO-1-style sharding: optimizer moments and EMA
    leaves that the tensor rules left replicated shard their largest
    divisible dim over ``axis`` (params themselves stay replicated — the
    Adam/EMA updates are elementwise, so XLA slices the replicated grads
    locally and only the updated-param all-gather crosses chips).  Cuts the
    dominant optimizer-state memory of the 865M UNet by the tp factor."""
    tp = mesh.shape[axis]

    def place(path, leaf):
        names = _path_names(path)
        shape = getattr(leaf, "shape", ())
        spec = tp_spec(names, shape, tp, axis)
        if (zero and spec == P() and names
                and names[0] in ("opt_state", "ema_params") and shape
                and int(np.prod(shape)) >= zero_min_size):
            dims = [d for d in range(len(shape)) if shape[d] % tp == 0]
            if dims:
                big = max(dims, key=lambda d: shape[d])
                s = [None] * len(shape)
                s[big] = axis
                spec = P(*s)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(place, state)


def shard_batch_dp(batch: dict, mesh: Mesh):
    """Place a host batch with the leading dim sharded over 'data' only."""
    sh = NamedSharding(mesh, P("data"))

    def put(x):
        arr = jax.numpy.asarray(x)
        return jax.device_put(arr, sh) if arr.ndim >= 1 else arr

    return {k: put(v) for k, v in batch.items()}
