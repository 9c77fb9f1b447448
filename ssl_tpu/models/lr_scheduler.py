"""LR schedules as optax-compatible, jit-traceable callables.

Reference parity: models/lr_scheduler.py (MultiStepRestartLR :6,
CosineAnnealingRestartLR :57) + plain MultiStepLR.  All schedules take a
(possibly traced) step and return a jnp scalar, so they live inside the
jitted train step."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def multi_step_lr(base_lr: float, milestones, gamma: float = 0.5,
                  restarts=(), restart_weights=()):
    """lr *= gamma at each milestone; at each restart the decay resets and lr
    is scaled by the restart weight (reference MultiStepRestartLR)."""
    milestones = jnp.asarray(sorted(milestones), dtype=jnp.int32) if len(milestones) else None
    restarts = list(restarts)
    weights = list(restart_weights) if restart_weights else [1.0] * len(restarts)

    def schedule(step):
        step = jnp.asarray(step)
        w = jnp.asarray(1.0)
        last_restart = jnp.asarray(0)
        for r, rw in zip(restarts, weights):
            hit = step >= r
            w = jnp.where(hit, rw, w)
            last_restart = jnp.where(hit, r, last_restart)
        if milestones is None:
            decay = 0
        else:
            decay = jnp.sum((last_restart + milestones)[None, :] <= step)
        return base_lr * w * (gamma ** decay)
    return schedule


def cosine_annealing_restart_lr(base_lr: float, periods, restart_weights=(1.0,), eta_min: float = 0.0):
    """Cosine annealing with warm restarts (reference lr_scheduler.py:57-107)."""
    cumulative = np.cumsum(np.asarray(periods))
    periods = np.asarray(periods)
    weights = np.asarray(list(restart_weights) + [restart_weights[-1]] * (len(periods) - len(restart_weights)))

    def schedule(step):
        step = jnp.asarray(step)
        idx = jnp.sum(step >= jnp.asarray(cumulative))  # which period we're in
        idx = jnp.minimum(idx, len(periods) - 1)
        nearest_restart = jnp.where(idx == 0, 0, jnp.asarray(np.concatenate([[0], cumulative]))[idx])
        period = jnp.asarray(periods)[idx]
        weight = jnp.asarray(weights)[idx]
        frac = (step - nearest_restart) / jnp.maximum(period, 1)
        return eta_min + weight * 0.5 * (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * frac))
    return schedule


def build_schedule(train_opt: dict, base_lr: float):
    sched = dict(train_opt.get("scheduler") or {})
    stype = sched.pop("type", None)
    warmup = train_opt.get("warmup_iter", -1)
    if stype in ("MultiStepLR", "MultiStepRestartLR"):
        base = multi_step_lr(base_lr, sched.get("milestones", []), sched.get("gamma", 0.5),
                             sched.get("restarts", ()), sched.get("restart_weights", ()))
    elif stype == "CosineAnnealingRestartLR":
        base = cosine_annealing_restart_lr(base_lr, sched["periods"],
                                           sched.get("restart_weights", (1.0,)),
                                           sched.get("eta_min", 0.0))
    elif stype is None:
        base = lambda step: jnp.asarray(base_lr)
    else:
        raise NotImplementedError(f"Scheduler {stype} is not implemented yet.")
    if warmup and warmup > 0:
        def with_warmup(step):
            return base(step) * jnp.minimum(1.0, (jnp.asarray(step) + 1) / warmup)
        return with_warmup
    return base
