"""Samplers: spaced DDPM + DDIM + Gaussian-weighted tiled latent canvas.

Reference parity: ldm/models/diffusion/ddim.py (DDIM), ddpm.py:2792
(p_sample_loop), :2908/:2890 (p_sample_loop_canvas with Gaussian tile
weights), test.py:273-295 (spaced schedule re-registration)."""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ssl_tpu.diffusion.schedules import DiffusionSchedule, space_timesteps


def ddim_sample(apply_model: Callable, sched: DiffusionSchedule, shape,
                rng, context, z_lq, steps: int = 50, eta: float = 0.0,
                parameterization: str = "eps"):
    """DDIM sampling loop under lax.scan (static step count)."""
    timesteps = np.asarray(space_timesteps(sched.num_timesteps, steps), np.int32)
    t_seq = jnp.asarray(timesteps[::-1].copy())
    t_prev_seq = jnp.asarray(np.concatenate([timesteps[::-1][1:], [-1]]).astype(np.int32))

    rng, r0 = jax.random.split(rng)
    x = jax.random.normal(r0, shape)
    ac = sched.alphas_cumprod

    def body(carry, ts):
        x, rng = carry
        t, t_prev = ts
        b = x.shape[0]
        tb = jnp.full((b,), t, jnp.int32)
        eps = apply_model(x, tb, context, z_lq)
        a_t = ac[t]
        a_prev = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], 1.0)
        if parameterization == "v":
            x0 = jnp.sqrt(a_t) * x - jnp.sqrt(1 - a_t) * eps
            eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        else:
            x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        sigma = eta * jnp.sqrt((1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev))
        rng, rn = jax.random.split(rng)
        noise = jax.random.normal(rn, x.shape)
        dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma ** 2, 0.0)) * eps
        x_new = jnp.sqrt(a_prev) * x0 + dir_xt + sigma * noise
        return (x_new, rng), None

    (x, _), _ = jax.lax.scan(body, (x, rng), (t_seq, t_prev_seq))
    return x


def plms_sample(apply_model: Callable, sched: DiffusionSchedule, shape,
                rng, context, z_lq, steps: int = 50,
                parameterization: str = "eps"):
    """PLMS (pseudo linear multistep, PNDM) sampling — reference
    ldm/models/diffusion/plms.py:173-235: Adams-Bashforth on the eps
    predictions (orders 2..4 as history accumulates), deterministic
    (the reference asserts ddim_eta == 0 for PLMS); first step is the
    pseudo improved Euler with a second model evaluation."""
    assert steps >= 2, "PLMS needs at least 2 steps"
    timesteps = np.asarray(space_timesteps(sched.num_timesteps, steps), np.int32)
    t_seq = jnp.asarray(timesteps[::-1].copy())
    t_prev_seq = jnp.asarray(np.concatenate([timesteps[::-1][1:], [-1]]).astype(np.int32))
    ac = sched.alphas_cumprod

    def eps_of(x, t):
        b = x.shape[0]
        tb = jnp.full((b,), t, jnp.int32)
        out = apply_model(x, tb, context, z_lq)
        if parameterization == "v":
            a_t = ac[t]
            x0 = jnp.sqrt(a_t) * x - jnp.sqrt(1 - a_t) * out
            out = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        return out

    def x_prev_of(x, e, t, t_prev):
        a_t = ac[t]
        a_prev = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], 1.0)
        x0 = (x - jnp.sqrt(1 - a_t) * e) / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * e

    rng, r0 = jax.random.split(rng)
    x = jax.random.normal(r0, shape)

    # step 0: pseudo improved Euler (two model evals)
    t0, t1 = t_seq[0], t_prev_seq[0]
    e0 = eps_of(x, t0)
    x_euler = x_prev_of(x, e0, t0, t1)
    e_next = eps_of(x_euler, t1)
    x = x_prev_of(x, (e0 + e_next) / 2.0, t0, t1)
    buf = jnp.stack([e0, e0, e0])                      # newest-first history

    def body(carry, inp):
        x, buf = carry
        i, t, t_prev = inp
        e_t = eps_of(x, t)
        branches = [
            lambda: (3 * e_t - buf[0]) / 2,
            lambda: (23 * e_t - 16 * buf[0] + 5 * buf[1]) / 12,
            lambda: (55 * e_t - 59 * buf[0] + 37 * buf[1] - 9 * buf[2]) / 24,
        ]
        e_prime = jax.lax.switch(jnp.minimum(i - 1, 2), branches)
        x_new = x_prev_of(x, e_prime, t, t_prev)
        buf = jnp.stack([e_t, buf[0], buf[1]])
        return (x_new, buf), None

    n = len(timesteps)
    idxs = jnp.arange(1, n)
    (x, _), _ = jax.lax.scan(body, (x, buf),
                             (idxs, t_seq[1:], t_prev_seq[1:]))
    return x


def spaced_ddpm_sample(apply_model: Callable, sched: DiffusionSchedule, shape,
                       rng, context, z_lq, steps: int = 200):
    """Spaced ancestral DDPM sampling (reference test.py uses ddpm_steps=200)."""
    timesteps = np.asarray(space_timesteps(sched.num_timesteps, steps), np.int32)
    betas_sub = _respaced_betas(sched, timesteps)
    alphas = 1 - betas_sub
    ac = jnp.asarray(np.cumprod(alphas))
    ac_prev = jnp.concatenate([jnp.ones(1), ac[:-1]])
    post_var = betas_sub * (1 - ac_prev) / (1 - ac)
    post_logvar = jnp.log(jnp.maximum(post_var, 1e-20))
    coef1 = betas_sub * jnp.sqrt(ac_prev) / (1 - ac)
    coef2 = (1 - ac_prev) * jnp.sqrt(alphas) / (1 - ac)
    t_orig = jnp.asarray(timesteps)

    rng, r0 = jax.random.split(rng)
    x = jax.random.normal(r0, shape)
    n = len(timesteps)

    def body(carry, i):
        x, rng = carry
        idx = n - 1 - i
        b = x.shape[0]
        tb = jnp.full((b,), t_orig[idx], jnp.int32)
        eps = apply_model(x, tb, context, z_lq)
        x0 = (x - jnp.sqrt(1 - ac[idx]) * eps) / jnp.sqrt(ac[idx])
        x0 = jnp.clip(x0, -1.0, 1.0)
        mean = coef1[idx] * x0 + coef2[idx] * x
        rng, rn = jax.random.split(rng)
        noise = jax.random.normal(rn, x.shape)
        nonzero = (idx != 0).astype(x.dtype)
        x_new = mean + nonzero * jnp.exp(0.5 * post_logvar[idx]) * noise
        return (x_new, rng), None

    (x, _), _ = jax.lax.scan(body, (x, rng), jnp.arange(n))
    return x


def _respaced_betas(sched: DiffusionSchedule, timesteps: np.ndarray) -> jnp.ndarray:
    ac = np.asarray(sched.alphas_cumprod)
    last = 1.0
    betas = []
    for t in timesteps:
        betas.append(1 - ac[t] / last)
        last = ac[t]
    return jnp.asarray(np.asarray(betas, np.float32))


def gaussian_tile_weights(tile_size: int, sigma_frac: float = 0.25) -> np.ndarray:
    """Gaussian blending weights for tiled latent sampling (reference
    ddpm.py:2890 gaussian_weights)."""
    ax = np.arange(tile_size) - (tile_size - 1) / 2.0
    sig = tile_size * sigma_frac
    g = np.exp(-(ax ** 2) / (2 * sig ** 2))
    w = np.outer(g, g)
    return (w / w.max()).astype(np.float32)


def tiled_sample(sample_fn: Callable, z_lq: jnp.ndarray, tile: int, overlap: int,
                 latent_channels: int = 4, data_parallel: bool = False):
    """Canvas-tiled sampling: run sample_fn on overlapping z_lq tiles and blend
    with Gaussian weights (reference p_sample_loop_canvas :2908-2981).

    ``data_parallel=True`` (beyond-parity, TPU-native): tiles are stacked
    along the batch axis in device-count-sized groups and sharded over a
    1-D mesh, so every chip diffuses a different canvas tile concurrently —
    the reference processes tiles serially on one GPU.  sample_fn must be
    batch-size-agnostic (all our samplers are).  Identical output to the
    serial path for deterministic sample_fns.
    """
    b, h, w, _ = z_lq.shape
    stride = tile - overlap
    weights = gaussian_tile_weights(tile)[None, :, :, None]
    canvas = np.zeros((b, h, w, latent_channels), np.float32)
    acc = np.zeros((b, h, w, 1), np.float32)
    ys = list(range(0, max(h - tile, 0) + 1, stride)) or [0]
    xs = list(range(0, max(w - tile, 0) + 1, stride)) or [0]
    if ys[-1] + tile < h:
        ys.append(h - tile)
    if xs[-1] + tile < w:
        xs.append(w - tile)
    coords = [(y0, x0) for y0 in ys for x0 in xs]

    if data_parallel:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ssl_tpu.parallel.mesh import create_mesh
        mesh = create_mesh()
        n = int(mesh.shape["data"])
        sharding = NamedSharding(mesh, P("data"))
        for c0 in range(0, len(coords), n):
            group = coords[c0:c0 + n]
            k = len(group)
            stack = jnp.concatenate(
                [z_lq[:, y0:y0 + tile, x0:x0 + tile, :] for y0, x0 in group]
                + [z_lq[:, ys[0]:ys[0] + tile, xs[0]:xs[0] + tile, :]] * (n - k),
                axis=0)
            stack = jax.device_put(stack, sharding)
            outs = np.asarray(sample_fn(stack))
            for j, (y0, x0) in enumerate(group):
                canvas[:, y0:y0 + tile, x0:x0 + tile, :] += outs[j * b:(j + 1) * b] * weights
                acc[:, y0:y0 + tile, x0:x0 + tile, :] += weights
        return jnp.asarray(canvas / np.maximum(acc, 1e-8))

    for y0, x0 in coords:
        z_tile = z_lq[:, y0:y0 + tile, x0:x0 + tile, :]
        out = np.asarray(sample_fn(z_tile))
        canvas[:, y0:y0 + tile, x0:x0 + tile, :] += out * weights
        acc[:, y0:y0 + tile, x0:x0 + tile, :] += weights
    return jnp.asarray(canvas / np.maximum(acc, 1e-8))
