"""RealESRGAN(-SSL) recipes with the blind two-stage degradation pipeline.

Reference parity: models/realesrganssl_model.py:23-793 and realesrgan_model.py.
The on-GPU no-grad degradation becomes a host-side pipeline stage
(`prepare_batch`) feeding the same jitted GAN(+SSL) train step; the 180-slot
training-pair pool and USM sharpening ride along (SURVEY §3.2)."""

from __future__ import annotations

import numpy as np

from ssl_tpu.data.realesr_degradation import RealESRGANDegrader
from ssl_tpu.models.esrganssl_model import ESRGANSSLModel
from ssl_tpu.models.srgan_model import SRGANModel
from ssl_tpu.models.sr_model import SRModel
from ssl_tpu.utils.registry import MODEL_REGISTRY


def _queue_shuffle_jit(state, batch, qsize: int, rng):
    """The reference's training-pair pool `_dequeue_and_enqueue`
    (realesrganssl_model.py:326-367) INSIDE the jit: buffers live in
    ``TrainState.extra``.  Until the pool is full, batches pass through while
    filling it; once full, the pool is permuted, its first b slots are
    dequeued as the training batch and the incoming batch takes their place.
    lq/gt(/gt_usm/gt_mask) are pooled together so pairs never decohere."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    qkeys = [k for k in ("lq", "gt", "gt_usm", "gt_mask") if k in batch]
    b = batch["lq"].shape[0]
    assert qsize % b == 0, (
        f"queue_size {qsize} must be divisible by batch size {b} "
        "(reference realesrganssl_model.py:334)")
    extra = dict(state.extra) if isinstance(state.extra, dict) else {}
    if "queue_ptr" not in extra:
        extra["queue_ptr"] = jnp.zeros((), jnp.int32)
        for k in qkeys:
            extra[f"queue_{k}"] = jnp.zeros((qsize,) + batch[k].shape[1:],
                                            batch[k].dtype)
    ptr = extra["queue_ptr"]
    perm = jax.random.permutation(rng, qsize)
    bufs = [extra[f"queue_{k}"] for k in qkeys]
    cur = [batch[k] for k in qkeys]

    def when_full(args):
        bufs, cur = args
        newbufs, out = [], []
        for buf, c in zip(bufs, cur):
            sbuf = jnp.take(buf, perm, axis=0)
            out.append(sbuf[:b])
            newbufs.append(lax.dynamic_update_slice(sbuf, c, (0,) * buf.ndim))
        return newbufs, out, ptr

    def when_filling(args):
        bufs, cur = args
        newbufs = [lax.dynamic_update_slice(buf, c, (ptr,) + (0,) * (buf.ndim - 1))
                   for buf, c in zip(bufs, cur)]
        return newbufs, list(cur), ptr + b

    newbufs, out, new_ptr = lax.cond(ptr >= qsize, when_full, when_filling,
                                     (bufs, cur))
    extra["queue_ptr"] = new_ptr
    for k, nb in zip(qkeys, newbufs):
        extra[f"queue_{k}"] = nb
    batch = dict(batch)
    for k, o in zip(qkeys, out):
        batch[k] = o
    return state.replace(extra=extra), batch


class _DegradationMixin:
    """Adds blind degradation to a recipe: host-side parity path (default) or
    the fully on-device jit path (``degradation_device: true`` — the
    degradation runs INSIDE the train step on the TPU, ops/degrade_jax.py;
    the dataset then only supplies cropped GT + mask + kernels).

    Device mode is the TPU-native fast path (degradation + USM measured free
    alongside the step, vs a host-core-bound pipeline; numerics oracle-pinned
    by tests/test_degradation_parity.py).  The reference's training-pair
    shuffle pool (`queue_size`, realesrganssl_model.py:326-367) lives INSIDE
    the jit in this mode: queue buffers ride ``TrainState.extra`` and the
    dequeue/enqueue (shuffle-when-full, then swap the first b slots) is
    lax.cond'd on the fill pointer — same semantics as the reference's
    host-side pool, keyed PRNG instead of torch randperm."""

    def _init_degrader(self, opt: dict):
        train_ds = (opt.get("datasets") or {}).get("train") or {}
        self.gt_size = train_ds.get("gt_size", 256)
        self.device_degrade = bool(opt.get("degradation_device", False))
        self.degrader = RealESRGANDegrader(
            opt,
            scale=opt.get("scale", 4),
            queue_size=opt.get("queue_size", 180),
            use_sharpen=opt.get("Use_sharpen") is not None,
            sharpen_before=bool(opt.get("Sharpen_before_degra")),
            degradation_order=opt.get("degradation_order", "two"),
            seed=opt.get("manual_seed"),
        )
        if self.device_degrade:
            from ssl_tpu.ops.degrade_jax import DegradeJaxConfig
            fields = DegradeJaxConfig._fields
            kwargs = {k: tuple(v) if isinstance(v, list) else v
                      for k, v in opt.items() if k in fields}
            kwargs["scale"] = opt.get("scale", 4)
            self.degrade_cfg = DegradeJaxConfig(**kwargs)
        self.l1_gt_usm = opt.get("l1_gt_usm", True)
        self.percep_gt_usm = opt.get("percep_gt_usm", True)
        self.gan_gt_usm = opt.get("gan_gt_usm", False)

    def host_state(self) -> dict:
        """Persist the host degrader's RNG streams (+ optionally the training
        -pair pool) so ``--auto_resume`` continues the degradation stream
        instead of replaying it from the seed — a reproducibility wart the
        reference shares (its loader workers re-seed from scratch too).
        Device mode needs none of this: its randomness is keyed off
        ``TrainState.rng``, which the checkpoint already carries."""
        hs = {"degrader_np_rng": self.degrader.rng.get_state(),
              "degrader_py_rng": self.degrader.pyrng.getstate()}
        pool = self.degrader.pool
        if pool is not None and self.opt.get("save_degradation_pool"):
            hs["pool_ptr"] = pool.ptr
            hs["pool_buffers"] = {k: np.array(v) for k, v in pool.buffers.items()}
        return hs

    def set_host_state(self, hs: dict) -> None:
        self.degrader.rng.set_state(hs["degrader_np_rng"])
        self.degrader.pyrng.setstate(hs["degrader_py_rng"])
        pool = self.degrader.pool
        if pool is not None and "pool_buffers" in hs:
            pool.ptr = int(hs["pool_ptr"])
            pool.buffers = {k: np.array(v) for k, v in hs["pool_buffers"].items()}

    def prepare_batch(self, batch: dict) -> dict:
        """Host-side feed_data: degrade + crop + queue (+USM). Call before
        train_step with raw dataset batches (gt/kernels[/mask]).  In device
        mode this is a pass-through (degradation happens inside the jit)."""
        if "lq" in batch:  # already paired (e.g. validation)
            return batch
        if self.device_degrade:
            return batch
        batch = dict(batch)
        batch["gt_size"] = self.gt_size
        out = self.degrader({k: np.asarray(v) for k, v in batch.items()
                             if isinstance(v, np.ndarray)} | {"gt_size": self.gt_size})
        return out

    def make_train_step(self):
        base = super().make_train_step()
        if not getattr(self, "device_degrade", False):
            return base
        from ssl_tpu.ops.degrade_jax import degrade_two_stage_jax
        from ssl_tpu.ops.img_process import usm_sharp
        cfg = self.degrade_cfg
        # *_gt_usm targets need the sharpened GT; in device mode USM rides the
        # same jit (oracle-pinned vs the reference's usm_sharp in
        # tests/test_degradation_parity.py) instead of the host pipeline.
        need_usm = any(getattr(self, f, False)
                       for f in ("l1_gt_usm", "percep_gt_usm", "gan_gt_usm"))

        qsize = int(self.opt.get("queue_size", 180) or 0)

        def step(state, batch):
            if "lq" not in batch:
                import jax
                key = jax.random.fold_in(state.rng, 0x5351)
                lq = degrade_two_stage_jax(key, batch["gt"], batch["kernel1"],
                                           batch["kernel2"], batch["sinc_kernel"], cfg)
                batch = {k: v for k, v in batch.items()
                         if k not in ("kernel1", "kernel2", "sinc_kernel")}
                batch["lq"] = lq
                if need_usm and "gt_usm" not in batch:
                    batch["gt_usm"] = usm_sharp(batch["gt"])
                if qsize > 0:
                    state, batch = _queue_shuffle_jit(
                        state, batch, qsize, jax.random.fold_in(state.rng, 0x51))
            return base(state, batch)
        return step


@MODEL_REGISTRY.register()
class RealESRGANModel(_DegradationMixin, SRGANModel):
    """Non-SSL RealESRGAN (reference realesrgan_model.py): degradation + UNet-SN D."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self._init_degrader(opt)


@MODEL_REGISTRY.register()
class RealESRGANSSLModel(_DegradationMixin, ESRGANSSLModel):
    """RealESRGAN + SSL penalty (reference realesrganssl_model.py)."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self._init_degrader(opt)

    def g_losses(self, params_g, state, batch, rng):
        """Same as ESRGANSSL but honoring the *_gt_usm switches: pixel and
        perceptual losses may target the sharpened GT (reference :369-384)."""
        import jax.numpy as jnp
        sr = self.net_g.apply({"params": params_g}, batch["lq"])
        gt = batch["gt"]
        gt_usm = batch.get("gt_usm", gt)
        total = 0.0
        logs = {}
        if self.cri_pix is not None:
            l_pix = self.cri_pix(sr, gt_usm if self.l1_gt_usm else gt)
            total += l_pix
            logs["l_pix"] = l_pix
        if self.use_ssl and "gt_mask" in batch:
            from ssl_tpu.losses.ssl_loss import ssl_loss
            l_ss, l_kl = ssl_loss(sr, gt, batch["gt_mask"], self.ssl_setting)
            if self.ssl_setting.l1_weight > 0:
                total += l_ss
                logs["l_selfsim"] = l_ss
            if self.ssl_setting.kl_weight > 0:
                total += l_kl
                logs["l_selfsim_kl"] = l_kl
        if self.cri_perceptual is not None:
            l_percep, l_style = self.cri_perceptual(sr, gt_usm if self.percep_gt_usm else gt)
            total += l_percep + l_style
            logs["l_percep"] = l_percep
        return total, logs, sr


@MODEL_REGISTRY.register()
class RealESRNetSSLModel(_DegradationMixin, SRModel):
    """Degradation + pixel-only pretraining stage (RealESRNet flavor)."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self._init_degrader(opt)


@MODEL_REGISTRY.register()
class RealESRNetModel(_DegradationMixin, SRModel):
    """RealESRNet: blind two-stage degradation + pixel-only loss, no GAN/SSL
    (reference realesrnet_model.py — same feed_data as RealESRGANModel, but the
    recipe trains only net_g with L1 against the (optionally USM-sharpened) GT)."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self._init_degrader(opt)

    def g_losses(self, params_g, state, batch, rng):
        sr = self.net_g.apply({"params": params_g}, batch["lq"])
        gt = batch.get("gt_usm", batch["gt"]) if self.l1_gt_usm else batch["gt"]
        total = 0.0
        logs = {}
        if self.cri_pix is not None:
            l_pix = self.cri_pix(sr, gt)
            total += l_pix
            logs["l_pix"] = l_pix
        if self.cri_perceptual is not None:
            l_percep, l_style = self.cri_perceptual(sr, gt)
            total += l_percep + l_style
            logs["l_percep"] = l_percep
        return total, logs, sr
