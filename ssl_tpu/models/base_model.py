"""BaseModel: functional training recipes around a pure TrainState pytree.

TPU-native redesign of the reference's mutable BaseModel
(basicsr/models/base_model.py): instead of in-place nets/optimizers, the whole
training state (params_g/d, EMA, optimizer states, step, PRNG key, queue
buffers) is one pytree, and ``optimize_parameters`` is a single jitted
``train_step(state, batch) -> (state, logs)``.  G/D alternation, EMA decay and
LR scheduling all live inside that one compiled region.

Checkpointing is orbax (SURVEY §5): save/restore of the full state pytree plus
separate 'params'/'params_ema' network-only saves for reference-style weights.
"""

from __future__ import annotations

import os
from copy import deepcopy
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ssl_tpu.archs import build_network
from ssl_tpu.models.lr_scheduler import build_schedule
from ssl_tpu.parallel.mesh import (create_mesh, data_axis_size, replicate_sharding,
                                   resolve_mesh, shard_batch)
from ssl_tpu.utils.registry import MODEL_REGISTRY


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    rng: jnp.ndarray
    params_g: Any
    opt_state_g: Any
    ema_params_g: Any = None
    params_d: Any = None
    stats_d: Any = None           # batch_stats / spectral-norm power iterates
    opt_state_d: Any = None
    extra: Any = None             # recipe-specific buffers (e.g. degradation queue)


def build_optimizer(optim_opt: dict, schedule: Callable):
    """Adam/AdamW/SGD/RMSprop factory (reference base_model.py:103-120)."""
    o = deepcopy(optim_opt)
    otype = o.pop("type", "Adam")
    o.pop("lr", None)
    betas = o.pop("betas", (0.9, 0.999))
    wd = o.pop("weight_decay", 0)
    if otype == "Adam":
        tx = optax.adam(schedule, b1=betas[0], b2=betas[1])
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    elif otype == "AdamW":
        tx = optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=wd)
    elif otype == "SGD":
        tx = optax.sgd(schedule, momentum=o.pop("momentum", 0.0))
    elif otype == "RMSprop":
        tx = optax.rmsprop(schedule)
    elif otype == "Adamax":
        tx = optax.adamax(schedule, b1=betas[0], b2=betas[1])
    else:
        raise NotImplementedError(f"optimizer {otype} is not supported yet.")
    return tx


def ema_update(ema_params, new_params, decay: float):
    """net_g_ema = decay*ema + (1-decay)*net_g (reference base_model.py:75-82)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, new_params)


class BaseModel:
    """Holds static config + jitted step fns; state is explicit."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.is_train = opt.get("is_train", True)
        self.scale = opt.get("scale", 4)
        self.mesh = resolve_mesh(opt)
        self.schedulers_info = {}
        self._train_step = None
        self._test_step = None

    # ------------------------------------------------------------------ build
    def build_g(self):
        net_opt = deepcopy(self.opt["network_g"])
        net_opt.setdefault("scale", self.scale)
        return build_network(net_opt)

    def init_params(self, net, shape, rng_seed=0, extra_kwargs=None):
        x = jnp.zeros(shape, jnp.float32)
        variables = net.init(jax.random.PRNGKey(rng_seed), x, **(extra_kwargs or {}))
        return variables

    # ------------------------------------------------------------ persistence
    def save_networks(self, state: TrainState, save_dir: str, current_iter: int):
        """Save reference-style weight files: params + params_ema as npz trees.

        Multi-host: EVERY process must call this at the same point — the
        device_get of mesh-placed arrays participates in the runtime's
        collective stream, so a rank-0-only call desynchronizes peers
        (observed as a gloo size-mismatch crash).  Only process 0 touches
        the filesystem."""
        import pickle
        payload = {"params": jax.device_get(state.params_g)}
        if state.ema_params_g is not None:
            payload["params_ema"] = jax.device_get(state.ema_params_g)
        payload_d = ({"params": jax.device_get(state.params_d)}
                     if state.params_d is not None else None)
        if jax.process_index() != 0:
            return
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, f"net_g_{current_iter}.pkl"), "wb") as f:
            pickle.dump(payload, f)
        if payload_d is not None:
            with open(os.path.join(save_dir, f"net_d_{current_iter}.pkl"), "wb") as f:
                pickle.dump(payload_d, f)

    def host_state(self) -> dict:
        """Host-side mutable state to persist alongside the device TrainState
        (e.g. the degrader's RNG streams).  Default: none."""
        return {}

    def set_host_state(self, hs: dict) -> None:
        """Restore what :meth:`host_state` captured."""

    def save_training_state(self, state: TrainState, state_dir: str, epoch: int, current_iter: int):
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(state_dir, f"{current_iter}"))
        ckptr = ocp.StandardCheckpointer()
        if jax.process_count() > 1:
            # multi-host: EVERY process calls save with the device arrays —
            # orbax coordinates (primary writes metadata, owners write
            # shards, internal barrier needs all ranks).  A rank-0-only
            # orbax call leaves its sync barrier unmatched (observed as a
            # gloo collective-mismatch crash on the CPU backend).
            ckptr.save(path, state, force=True)
            ckptr.wait_until_finished()
        else:
            ckptr.save(path, jax.device_get(state), force=True)
            ckptr.wait_until_finished()
        if jax.process_index() != 0:
            return
        hs = self.host_state()
        if hs:
            import pickle
            with open(os.path.join(state_dir, f"host_{current_iter}.pkl"), "wb") as f:
                pickle.dump(hs, f)
        with open(os.path.join(state_dir, "latest"), "w") as f:
            f.write(str(current_iter))

    def load_training_state(self, state_template: TrainState, state_dir: str, current_iter: int | str = "latest"):
        import orbax.checkpoint as ocp
        if current_iter == "latest":
            with open(os.path.join(state_dir, "latest")) as f:
                current_iter = int(f.read().strip())
        path = os.path.abspath(os.path.join(state_dir, str(current_iter)))
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, jax.device_get(state_template))
        host_path = os.path.join(state_dir, f"host_{current_iter}.pkl")
        if os.path.exists(host_path):
            import pickle
            with open(host_path, "rb") as f:
                self.set_host_state(pickle.load(f))
        return jax.tree_util.tree_map(jnp.asarray, restored), int(current_iter)

    @staticmethod
    def find_latest_state(state_dir: str) -> int | None:
        """auto_resume: scan for the max saved iter (reference train.py:68-88)."""
        if not os.path.isdir(state_dir):
            return None
        iters = [int(d) for d in os.listdir(state_dir) if d.isdigit()]
        return max(iters) if iters else None

    def train_init_shape(self, batch_size: int, lq_size: int):
        """Shape of the G's lq input for init_state in the train CLI; video
        recipes prepend the temporal axis."""
        return (batch_size, lq_size, lq_size, 3)

    # ------------------------------------------------------------------ utils
    def shard(self, batch: dict) -> dict:
        return shard_batch(batch, self.mesh)

    @property
    def n_data_shards(self) -> int:
        """Local data-parallel width: how many ways the CLI splits a batch."""
        return data_axis_size(self.mesh)

    def _match_param_devices(self, params, x):
        """When params live mesh-placed (multi-device), replicate a host/val
        input onto the same device set so jit sees one coherent layout
        (batch=1 validation inputs can't shard over 'data')."""
        leaves = jax.tree_util.tree_leaves(params)
        if leaves and isinstance(leaves[0], jax.Array) and \
                len(leaves[0].sharding.device_set) > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            mesh = leaves[0].sharding.mesh
            return jax.device_put(jnp.asarray(x), NamedSharding(mesh, PartitionSpec()))
        return x

    def place_state(self, state):
        """Pin the TrainState's device layout for the training loop: params
        replicated over the mesh (reference DDP semantics, base_model.py:95),
        or fsdp-rule-sharded when the mesh has an 'fsdp' axis.  Batches then
        arrive data-sharded and XLA inserts the gradient all-reduces."""
        if self.mesh.size <= 1:
            return state
        if "fsdp" in self.mesh.axis_names:
            from ssl_tpu.parallel.fsdp import shard_state
            min_size = int((self.opt.get("parallel") or {}).get("fsdp_min_size", 2 ** 14))
            return shard_state(state, self.mesh, min_size=min_size)
        return jax.device_put(state, replicate_sharding(self.mesh))

    def current_lr(self, train_opt: dict, step: int) -> float:
        sched = build_schedule(train_opt, train_opt["optim_g"].get("lr", 1e-4))
        return float(sched(step))


def build_model(opt: dict):
    """Reference surface: models/__init__.py:18-28."""
    from ssl_tpu import models as _models  # noqa: F401  (ensure registry populated)
    model = MODEL_REGISTRY.get(opt["model_type"])(opt)
    return model
