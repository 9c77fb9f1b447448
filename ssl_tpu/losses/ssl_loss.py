"""The SSL training penalty: L1 + KL between SSGs of SR output and GT.

Replaces the reference's per-image Python loop (esrganssl_model.py:158-209)
with a vmap over the batch using fixed-capacity edge positions, so the whole
loss is one jit-compiled region with static shapes.

Reduction parity: the reference concatenates all per-image SSGs to
(1, N_total, 625) and takes torch-mean over every element; here that is a
validity-masked mean with denominator N_valid * search^2."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ssl_tpu.losses.basic_loss import KLDistanceLoss
from ssl_tpu.ops.ssg import SSGConfig, apply_mask_stride, mask_to_positions, ssg_matrix


class SSLSetting(NamedTuple):
    """Mirror of the YAML ``ssl_setting`` block + loss weights."""
    ssg: SSGConfig = SSGConfig()
    mask_stride: int = 0        # 0/1 = off (GAN-tree shipped behavior); >1 = diagonal lattice
    capacity: int = 4096        # fixed per-image edge-pixel capacity under jit
    l1_weight: float = 1e3      # selfsim_opt loss_weight
    kl_weight: float = 1e3      # selfsim1_opt loss_weight
    kl_softmax: bool = False
    impl: str = "dense"         # 'dense' (fused, exact) | 'scan' (gather) | 'pallas'
    # experimental diffusion-tree strategy zoo (losses/simself_strategies.py):
    # '' = the shipped fast path (areaarea_mask_nonlocalavg_cuda_v1 semantics);
    # any other reference strategy name routes through simself_strategy_loss.
    strategy: str = ""
    strategy_opts: tuple = ()   # frozen (key, value) pairs (sslopt zoo knobs)


def ssl_setting_from_opt(opt: dict, train_opt: dict | None = None, gt_size: int | None = None) -> SSLSetting:
    """Build from a reference-schema option dict.

    Replicates the reference's per-tree mask_stride behavior: the stride is
    *defined* in ``ssl_setting`` but *applied* only if ``train.mask_stride``
    (GAN tree reads opt['train'], so shipped GAN configs have it off —
    esrganssl_model.py:164 vs train_ESRGANSSL_bicubic_x4.yml:70).  Set
    ``ssl_setting.apply_mask_stride: true`` to force it on regardless."""
    s = opt.get("ssl_setting", {})
    import os as _os
    ssg = SSGConfig(
        search=s.get("kernel_size_search", 25),
        window=s.get("kernel_size_window", 9),
        sigma=s.get("sigma", 0.004),
        generalization=s.get("generalization", True),
        q_store_dtype=s.get("q_store_dtype",
                            _os.environ.get("SSG_STORE_DTYPE", "float32")),
        stream_dtype=s.get("stream_dtype",
                           _os.environ.get("SSG_STREAM_DTYPE", "float32")),
        pair_offsets=s.get("pair_offsets",
                           _os.environ.get("SSG_PAIR_OFFSETS", "1") != "0"),
    )
    train_opt = train_opt or opt.get("train", {}) or {}
    stride = train_opt.get("mask_stride", 0)
    if s.get("apply_mask_stride", False):
        stride = s.get("mask_stride", 0)
    l1_w = kl_w = 0.0
    kl_sm = False
    if train_opt.get("selfsim_opt"):
        l1_w = train_opt["selfsim_opt"].get("loss_weight", 1.0)
    if train_opt.get("selfsim1_opt"):
        kl_w = train_opt["selfsim1_opt"].get("loss_weight", 1.0)
        kl_sm = train_opt["selfsim1_opt"].get("softmax", False)
    cap = s.get("capacity", (gt_size * gt_size) // 3 if gt_size else 4096)
    # reference-config compat: ssl_mode 'cuda'/'pytorch' both map to the exact
    # dense TPU path unless an explicit impl is given
    impl = s.get("impl")
    if impl is None:
        impl = {"cuda": "dense", "pytorch": "dense"}.get(s.get("ssl_mode"), "dense")
    # diffusion-tree strategy zoo: any non-default simself_strategy routes
    # through losses/simself_strategies.py (the shipped default — both trees'
    # configs — is the fast fused path below)
    strategy = s.get("simself_strategy", "")
    if strategy in ("areaarea_mask_nonlocalavg_cuda_v1", "ssl_cuda"):
        strategy = ""
    zoo_keys = ("simself_dh", "simself_dw", "kernel_size", "scaling_factor",
                "softmax_sr", "softmax_gt", "temperature", "crossentropy",
                "rearrange_back", "kernel_size_center", "mean", "var",
                "gene_type", "largest_k")
    strategy_opts = tuple((k, s[k]) for k in zoo_keys if k in s)
    return SSLSetting(ssg=ssg, mask_stride=int(stride), capacity=int(cap),
                      l1_weight=float(l1_w), kl_weight=float(kl_w), kl_softmax=kl_sm,
                      impl=impl, strategy=strategy, strategy_opts=strategy_opts)


def ssl_loss(sr: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray, setting: SSLSetting):
    """Compute (l_selfsim, l_selfsim_kl) for a batch.

    sr, gt: NHWC (b,h,w,c) float32; mask: (b,h,w,1) or (b,h,w) binary edge masks.
    GT's SSG is a constant target (stop_gradient), matching the reference where
    the graph of the GT branch is never back-propagated in practice."""
    if setting.strategy:
        # experimental diffusion-tree strategies (exact issl composition)
        from ssl_tpu.losses.simself_strategies import simself_strategy_loss
        return simself_strategy_loss(sr, gt, mask, setting)
    if mask.ndim == 4:
        mask = mask[..., 0]
    mask = apply_mask_stride(mask, setting.mask_stride)
    n2 = setting.ssg.search * setting.ssg.search

    if setting.impl == "pallas" and not setting.kl_softmax:
        # fused VMEM kernel forward + analytic XLA backward
        from ssl_tpu.ops.ssg_pallas import ssl_loss_sums_pallas
        interpret = jax.default_backend() == "cpu"
        l1_sum, kl_sum, count = ssl_loss_sums_pallas(
            sr.transpose(0, 3, 1, 2), gt.transpose(0, 3, 1, 2), mask,
            setting.ssg, interpret)
        denom = count * n2 + 1e-12
        return (l1_sum / denom * setting.l1_weight,
                kl_sum / denom * setting.kl_weight)

    if setting.impl == "dense" and not setting.kl_softmax:
        # fused masked-dense path: exact for any edge count, no gather.
        # Natively batched (NOT vmapped) — see ops/ssg.py batching note.
        from ssl_tpu.ops.ssg import ssl_loss_dense_batched, ssl_loss_dense_stored

        # stored-q fast path: one q-stack in HBM replaces the pass2 + backward
        # recomputes (~3x -> ~1x offset sweeps) when it fits; exact fp32, so
        # value-identical to the scanned path (ops/ssg.py §stored-q)
        import os

        import numpy as _np
        b, h, w = mask.shape
        itemsize = _np.dtype(setting.ssg.q_store_dtype).itemsize
        store_bytes = n2 * 2 * b * h * w * itemsize
        budget = int(os.environ.get("SSG_STORE_BYTES", str(2 * 1024 ** 3)))
        dense_fn = ssl_loss_dense_stored if store_bytes <= budget \
            else ssl_loss_dense_batched
        l1_sum, kl_sum, count = dense_fn(
            sr.transpose(0, 3, 1, 2), gt.transpose(0, 3, 1, 2), mask, setting.ssg)
        denom = count * n2 + 1e-12
        return (l1_sum / denom * setting.l1_weight,
                kl_sum / denom * setting.kl_weight)

    def per_image(sr_i, gt_i, mask_i):
        pos, valid, count = mask_to_positions(mask_i, setting.capacity)
        q_sr = ssg_matrix(sr_i.transpose(2, 0, 1), pos, setting.ssg, impl=setting.impl)
        q_gt = ssg_matrix(gt_i.transpose(2, 0, 1), pos, setting.ssg, impl=setting.impl)
        return q_sr, q_gt, valid

    q_sr, q_gt, valid = jax.vmap(per_image)(sr, gt, mask)
    q_gt = jax.lax.stop_gradient(q_gt)
    vmask = valid[..., None].astype(sr.dtype)            # (b, cap, 1)
    denom = jnp.sum(vmask) * q_sr.shape[-1] + 1e-12

    l1 = jnp.sum(jnp.abs(q_sr - q_gt) * vmask) / denom * setting.l1_weight

    kl_fn = KLDistanceLoss(loss_weight=1.0, reduction="none", softmax=setting.kl_softmax)
    kl = jnp.sum(kl_fn.pointwise(q_sr, q_gt) * vmask) / denom * setting.kl_weight
    return l1, kl
