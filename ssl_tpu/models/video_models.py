"""Video SR training recipes (reference: the diffusion tree's vendored
basicsr models — video_base_model.py, video_recurrent_model.py,
edvr_model.py, video_gan_model.py, video_recurrent_gan_model.py).

TPU-native redesign notes:
- The reference's ``requires_grad_`` flips at iteration thresholds
  (fix_flow/tsa_iter — video_recurrent_model.py:52-63, edvr_model.py:48-62)
  become step-conditioned gradient masks INSIDE the one jitted train step:
  ``where(it < thresh & is_frozen_subtree, 0, g)``.  No recompiles, no host
  round-trip, identical trajectories (torch leaves frozen params' Adam
  moments at zero; zeroed grads do the same here).
- Per-param-group lr multipliers (flow_lr_mul / dcn_lr_mul / lr_flow —
  video_recurrent_model.py:22-50, edvr_model.py:18-46) become update
  scalings: with Adam the update is linear in lr, so scaling the optimizer
  update of the matched subtree by the ratio is exact, and the ratio is
  schedule-invariant (MultiStepLR scales all group lrs by the same gamma).
- Video validation is the reference's per-folder protocol
  (video_base_model.py:18-160): accumulate per-frame metrics per clip
  folder, average within each folder, then across folders.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ssl_tpu.metrics import calculate_metric
from ssl_tpu.models.base_model import TrainState
from ssl_tpu.models.sr_model import SRModel
from ssl_tpu.models.srgan_model import SRGANModel
from ssl_tpu.utils.img_util import array2img, imwrite
from ssl_tpu.utils.registry import MODEL_REGISTRY


def _subtree_mask(tree, substrs):
    """Static bool mask: leaf's flattened path contains any substring.
    Matches the reference's ``'spynet' in name`` tests over
    ``named_parameters()`` (video_recurrent_model.py:33)."""
    substrs = tuple(s.lower() for s in substrs)

    def joined(path):
        return "/".join(str(getattr(k, "key", k)) for k in path).lower()

    return jax.tree_util.tree_map_with_path(
        lambda path, x: any(s in joined(path) for s in substrs), tree)


def _masked_zero_until(tree, mask_substrs, step, until, invert=False):
    """Zero leaves matching (or, inverted, NOT matching) the substrings while
    ``step+1 < until``; `until` may be None/0 (no-op)."""
    if not until:
        return tree
    frozen = (step + 1) < until  # traced bool; reference freezes iters 1..until-1
    mask = _subtree_mask(tree, mask_substrs)

    def apply(m, g):
        hit = m if not invert else not m
        if not hit:
            return g
        return jnp.where(frozen, jnp.zeros_like(g), g)

    return jax.tree_util.tree_map(apply, mask, tree)


def _scale_subtree(tree, substrs, mul):
    if mul == 1:
        return tree
    mask = _subtree_mask(tree, substrs)
    return jax.tree_util.tree_map(lambda m, u: u * mul if m else u, mask, tree)


class _VideoValidationMixin:
    """Per-folder video validation + 5D-aware test() (reference
    video_base_model.py dist_validation/_log_validation_metric_values)."""

    #: spatial size multiple for test-time padding (EDVR pyramid needs /4)
    pad_mult = 4

    def train_init_shape(self, batch_size, lq_size):
        t = (self.opt["datasets"]["train"] or {}).get("num_frame", 5)
        return (batch_size, t, lq_size, lq_size, 3)

    def test(self, state: TrainState, lq: np.ndarray) -> np.ndarray:
        params = self.infer_params(state)
        lq = np.asarray(lq, np.float32)
        if lq.ndim == 4:   # (t,h,w,c) single clip -> add batch
            lq = lq[None]
        val_opt = self.opt.get("val") or {}
        n = lq.shape[1]
        if val_opt.get("flip_seq"):
            # recurrent self-ensemble: forward + time-reversed pass averaged
            # (video_recurrent_model.py:176-192)
            lq = np.concatenate([lq, lq[:, ::-1]], axis=1)
        b, t, h, w, c = lq.shape
        ph = (self.pad_mult - h % self.pad_mult) % self.pad_mult
        pw = (self.pad_mult - w % self.pad_mult) % self.pad_mult
        if ph or pw:
            lq = np.pad(lq, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        out = np.asarray(self._apply_g(params, jnp.asarray(lq)))
        s = self.scale
        if out.ndim == 5:
            out = out[:, :, : h * s, : w * s, :]
            if val_opt.get("flip_seq"):
                out = 0.5 * (out[:, :n] + out[:, n:][:, ::-1])
            if val_opt.get("center_frame_only"):
                out = out[:, n // 2]
        else:
            out = out[:, : h * s, : w * s, :]
        return out

    def validation(self, state: TrainState, dataloader, current_iter,
                   tb_logger=None, save_img=False):
        dataset_name = dataloader.dataset.opt.get("name", "val")
        metric_opts = (self.opt.get("val") or {}).get("metrics") or {}
        per_folder: dict = {}
        for batch in dataloader:
            folder = batch["folder"][0] if isinstance(batch["folder"], (list, tuple)) \
                else batch["folder"]
            sr = self.test(state, batch["lq"][0] if np.asarray(batch["lq"]).ndim > 4
                           else batch["lq"])
            gt = np.asarray(batch["gt"][0]) if "gt" in batch else None
            # clip mode (recurrent): sr (1,t,H,W,c) + gt (t,H,W,c); frame
            # mode (windowed): sr (1,H,W,c) + gt (H,W,c)
            sr_frames = sr[0] if sr.ndim == 5 else sr
            if sr_frames.ndim == 3:
                sr_frames = sr_frames[None]
            gt_frames = gt if (gt is not None and gt.ndim == 4) else \
                (gt[None] if gt is not None else None)
            rec = per_folder.setdefault(folder, {name: [] for name in metric_opts})
            for fi in range(sr_frames.shape[0]):
                sr_img = array2img(sr_frames[fi], rgb2bgr=False)
                if save_img and not self.opt.get("is_train", True):
                    img_name = os.path.splitext(os.path.basename(batch["lq_path"][0]))[0]
                    save_path = os.path.join(self.opt["path"]["visualization"],
                                             dataset_name, folder,
                                             f"{img_name}_{fi:08d}.png")
                    imwrite(sr_img[..., ::-1] if sr_img.ndim == 3 else sr_img, save_path)
                if gt_frames is not None:
                    gt_img = array2img(gt_frames[fi], rgb2bgr=False)
                    for name, m_opt in metric_opts.items():
                        rec[name].append(calculate_metric(
                            {"img": sr_img, "img2": gt_img}, m_opt))
        # folder means, then cross-folder mean (video_base_model.py:118-141)
        avg = {}
        for name in metric_opts:
            folder_means = [float(np.mean(rec[name])) for rec in per_folder.values()
                            if rec[name]]
            if folder_means:
                avg[name] = float(np.mean(folder_means))
        self._update_best(dataset_name, avg, current_iter, metric_opts)
        if tb_logger is not None:
            for name, val in avg.items():
                tb_logger.add_scalar(f"metrics/{dataset_name}/{name}", val, current_iter)
        return avg


@MODEL_REGISTRY.register()
class VideoBaseModel(_VideoValidationMixin, SRModel):
    """Base video SR recipe (reference video_base_model.py:15): SRModel
    training on (b, t, h, w, c) frame windows, per-folder validation."""


@MODEL_REGISTRY.register()
class EDVRModel(VideoBaseModel):
    """EDVR recipe (reference edvr_model.py:7-62): ``tsa_iter`` trains only
    the TSA fusion module first; ``dcn_lr_mul`` scales the deformable-conv
    offset branches' lr."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        train_opt = opt.get("train") or {}
        self.train_tsa_iter = train_opt.get("tsa_iter")
        self.dcn_lr_mul = train_opt.get("dcn_lr_mul", 1)

    def adjust_grads_g(self, grads, state: TrainState):
        # freeze everything EXCEPT 'fusion' while it < tsa_iter
        return _masked_zero_until(grads, ("fusion",), state.step,
                                  self.train_tsa_iter, invert=True)

    def adjust_updates_g(self, updates, state: TrainState):
        return _scale_subtree(updates, ("dcn",), self.dcn_lr_mul)


@MODEL_REGISTRY.register()
class VideoRecurrentModel(VideoBaseModel):
    """Recurrent video SR recipe (reference video_recurrent_model.py:15):
    ``fix_flow`` freezes the optical-flow net (spynet/edvr extractor) for the
    first N iters; ``flow_lr_mul`` scales its lr."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        train_opt = opt.get("train") or {}
        self.fix_flow_iter = train_opt.get("fix_flow")
        self.flow_lr_mul = train_opt.get("flow_lr_mul", 1)

    def adjust_grads_g(self, grads, state: TrainState):
        return _masked_zero_until(grads, ("spynet", "edvr"), state.step,
                                  self.fix_flow_iter)

    def adjust_updates_g(self, updates, state: TrainState):
        return _scale_subtree(updates, ("spynet",), self.flow_lr_mul)


@MODEL_REGISTRY.register()
class VideoGANModel(_VideoValidationMixin, SRGANModel):
    """Video GAN recipe (reference video_gan_model.py:7): SRGANModel's
    optimization (the generator emits a single center frame, so the D sees
    4D batches directly) + video validation."""

    def d_init_shape(self, lq_shape):
        b, t, h, w, c = lq_shape
        return (b, h * self.scale, w * self.scale, c)


@MODEL_REGISTRY.register()
class VideoRecurrentGANModel(_VideoValidationMixin, SRGANModel):
    """Recurrent video GAN recipe (reference video_recurrent_gan_model.py:12):
    the G emits full sequences; D/perceptual run on the temporal-flattened
    frame batch (``view(-1, c, h, w)``, :132-141), with the flow freeze and
    the separate flow lr (``fix_flow``/``lr_flow``, :68-115)."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        train_opt = opt.get("train") or {}
        self.fix_flow_iter = train_opt.get("fix_flow")
        self.lr_flow = train_opt.get("lr_flow")
        self.base_lr_g = (train_opt.get("optim_g") or {}).get("lr", 1e-4)

    def d_init_shape(self, lq_shape):
        b, t, h, w, c = lq_shape
        return (b, h * self.scale, w * self.scale, c)

    def d_view(self, x):
        if x.ndim == 5:
            return x.reshape((-1,) + x.shape[2:])
        return x

    def g_losses(self, params_g, state: TrainState, batch: dict, rng):
        sr = self.net_g.apply({"params": params_g}, batch["lq"])
        total = 0.0
        logs = {}
        if self.cri_pix is not None:
            l_pix = self.cri_pix(sr, batch["gt"])
            total += l_pix
            logs["l_pix"] = l_pix
        if self.cri_perceptual is not None:
            l_percep, l_style = self.cri_perceptual(self.d_view(sr),
                                                    self.d_view(batch["gt"]))
            total += l_percep + l_style
            logs["l_percep"] = l_percep
        return total, logs, sr

    def adjust_grads_g(self, grads, state: TrainState):
        return _masked_zero_until(grads, ("spynet", "edvr"), state.step,
                                  self.fix_flow_iter)

    def adjust_updates_g(self, updates, state: TrainState):
        if self.lr_flow is None:
            return updates
        return _scale_subtree(updates, ("spynet",), self.lr_flow / self.base_lr_g)
