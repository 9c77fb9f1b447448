"""Spatially-sharded SR inference — multi-chip halo exchange over ICI.

Beyond-parity TPU feature (the reference's only big-image path is the
serial single-GPU ``tile_process``, esrganssl_model.py:290-356): the image's
height axis is sharded across a device mesh, each device exchanges
``2*halo`` boundary rows with its neighbors via ``lax.ppermute`` (rides ICI,
never the host), runs the generator on its ``s + 2*halo``-row window, and
crops its ``s``-row output shard.  Wall-clock scales ~1/n for compute-bound
nets while HBM per chip holds only 1/n of the activations.

Exactness: per-device windows are built so a shard at the true image edge
starts exactly at the image boundary (the net's own implicit conv padding
applies, identical to full-image inference), and interior shards see
``halo`` real rows on each side.  Whenever ``halo`` >= the generator's
receptive-field radius the sharded output equals single-device full-image
inference elementwise (pinned by tests/test_spatial_infer.py).  With smaller
halos it degrades exactly like ``tile_process`` does with small tile_pad.

Works for any fully-convolutional NHWC apply_fn (RRDBNet / MSRResNet /
SRVGG / BSRGAN...); window-attention nets (SwinIR/ELAN) need their mod-pad
handled inside the arch, which ours do, but their window shifts make the
halo-exactness bound the attention span, not the conv RF.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map            # jax >= 0.8
except ImportError:                      # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def create_spatial_mesh(devices=None, axis_name: str = "sp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def spatial_infer(apply_fn, params, img: jnp.ndarray, scale: int,
                  mesh: Mesh | None = None, axis: str = "sp",
                  halo: int = 32) -> jnp.ndarray:
    """SR the (b, H, W, c) image with H sharded over ``mesh``'s ``axis``.

    apply_fn(params, x_nhwc) -> (b, h*scale, w*scale, c).  Returns the full
    (b, H*scale, W*scale, c) result (H padded internally to a multiple of the
    mesh size; the pad is cropped from the output).
    """
    mesh = mesh or create_spatial_mesh()
    n = int(mesh.shape[axis])
    if n == 1:
        return apply_fn(params, img)
    halo = int(halo)
    assert halo >= 1, "spatial_infer needs halo >= 1 (x[:, -2*halo:] slicing)"
    b, h_img, w_img, c = img.shape
    s = int(math.ceil(h_img / n))
    # each device donates its outer 2*halo rows to the neighbor
    s = max(s, 2 * halo)
    hp = s * n
    if hp - h_img >= h_img:
        # image too small for this mesh/halo — sharding would mostly process
        # reflect padding; run single-device
        return apply_fn(params, img)
    if hp != h_img:
        img = jnp.pad(img, ((0, 0), (0, hp - h_img), (0, 0), (0, 0)),
                      mode="reflect")

    def local(p, x):                      # x: (b, s, W, c) local shard
        i = lax.axis_index(axis)
        frm_above = lax.ppermute(x[:, -2 * halo:], axis,
                                 [(j, j + 1) for j in range(n - 1)])
        frm_below = lax.ppermute(x[:, :2 * halo], axis,
                                 [(j + 1, j) for j in range(n - 1)])
        cat = jnp.concatenate([frm_above, x, frm_below], axis=1)
        # rows kept ABOVE the own shard inside the window: edge shards keep
        # the true image boundary at the window edge (implicit-conv-pad
        # exactness), interior shards take `halo` from each neighbor
        top = jnp.where(i == 0, 0, jnp.where(i == n - 1, 2 * halo, halo))
        win = lax.dynamic_slice_in_dim(cat, 2 * halo - top, s + 2 * halo,
                                       axis=1)
        y = apply_fn(p, win)
        return lax.dynamic_slice_in_dim(y, top * scale, s * scale, axis=1)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(None, axis)), out_specs=P(None, axis))
    out = jax.jit(fn)(params, img)
    return out[:, : h_img * scale]
