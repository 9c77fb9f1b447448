"""Host-side Real-ESRGAN two-stage degradation pipeline (numpy/cv2).

Faithful re-implementation of the reference's on-GPU ``feed_data``
(realesrganssl_model.py:148-317): per-batch random draws (resize scale/mode,
noise family, op order) + per-item blur kernels and JPEG qualities, the
180-slot shuffled training-pair pool, and USM sharpening.

Design note (TPU-first): the reference runs this on GPU under ``no_grad``;
here it runs on host CPU inside the input pipeline thread, overlapped with
TPU compute — degradation needs no gradients, and keeping it host-side avoids
dynamic shapes inside jit (the random-resize changes tensor sizes).  JPEG is
the same DCT/quant math as ``ops/diffjpeg.py`` (numpy port), NOT cv2's codec,
to stay distribution-identical with the reference's DiffJPEG."""

from __future__ import annotations

import random as pyrandom

import cv2
import numpy as np

from ssl_tpu.ops.diffjpeg import C_TABLE, Y_TABLE, _dct_matrix

_DCT_NP = _dct_matrix()

_RGB2YCBCR_NP = np.array([
    [0.299, 0.587, 0.114],
    [-0.168736, -0.331264, 0.5],
    [0.5, -0.418688, -0.081312]], np.float32).T
_YCBCR2RGB_NP = np.array([
    [1.0, 0.0, 1.402],
    [1.0, -0.344136, -0.714136],
    [1.0, 1.772, 0.0]], np.float32).T


def filter2d_np(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Reflect-padded 2-D filtering per channel (reference filter2D semantics)."""
    return cv2.filter2D(img, -1, kernel, borderType=cv2.BORDER_REFLECT_101)


def usm_sharp_np(img: np.ndarray, weight: float = 0.5, radius: int = 50,
                 threshold: int = 10) -> np.ndarray:
    """Unsharp masking (reference utils/img_process_util.py:34-84)."""
    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype(np.float32)
    soft_mask = cv2.GaussianBlur(mask, (radius, radius), 0)
    sharp = np.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img


def _resize(img, size_or_scale, mode: str):
    interp = {"area": cv2.INTER_AREA, "bilinear": cv2.INTER_LINEAR,
              "bicubic": cv2.INTER_CUBIC}[mode]
    if isinstance(size_or_scale, tuple):
        h, w = size_or_scale
        return cv2.resize(img, (w, h), interpolation=interp)
    s = size_or_scale
    return cv2.resize(img, None, fx=s, fy=s, interpolation=interp)


def add_gaussian_noise(img, sigma_range, gray_prob, rng):
    sigma = rng.uniform(*sigma_range)
    if rng.uniform() < gray_prob:
        noise = rng.randn(*img.shape[:2], 1).astype(np.float32) * sigma / 255.0
    else:
        noise = rng.randn(*img.shape).astype(np.float32) * sigma / 255.0
    return np.clip(img + noise, 0, 1)


def add_poisson_noise(img, scale_range, gray_prob, rng):
    scale = rng.uniform(*scale_range)
    gray = rng.uniform() < gray_prob
    base = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[..., None] if gray else img
    # number of distinct uint8 levels via bincount (np.unique is O(n log n))
    flat = (base * 255).round().astype(np.uint8).reshape(-1)
    n_levels = int((np.bincount(flat, minlength=256) > 0).sum())
    vals = max(2.0 ** np.ceil(np.log2(max(n_levels, 2))), 2.0)
    noisy = rng.poisson(np.clip(base, 0, 1) * vals) / float(vals)
    noise = (noisy - base) * scale
    return np.clip(img + noise, 0, 1)


def jpeg_np(img: np.ndarray, quality: float) -> np.ndarray:
    """DCT-based JPEG round-trip, numpy (same math as ops/diffjpeg.diff_jpeg)."""
    h, w = img.shape[:2]
    ph, pw = (16 - h % 16) % 16, (16 - w % 16) % 16
    x = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge") * 255.0
    hp, wp = h + ph, w + pw
    ycc = x @ _RGB2YCBCR_NP + np.array([0.0, 128.0, 128.0], np.float32)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    cb = cb.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
    factor = (5000.0 / quality if quality < 50 else 200.0 - quality * 2.0) / 100.0

    def block(chan):
        hh, ww = chan.shape
        b = chan.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
        return b, hh, ww

    def unblock(b, hh, ww):
        return b.transpose(0, 2, 1, 3).reshape(hh, ww)

    def roundtrip(chan, table):
        b, hh, ww = block(chan - 128.0)
        coefs = np.einsum("ij,nmjk,lk->nmil", _DCT_NP, b, _DCT_NP)
        # raw table*factor like the reference DiffJPEG (no libjpeg floor+clip)
        q = table * factor
        deq = np.round(coefs / q) * q
        rec = np.einsum("ji,nmjk,kl->nmil", _DCT_NP, deq, _DCT_NP)
        return unblock(rec, hh, ww) + 128.0

    y2 = roundtrip(y, Y_TABLE)
    cb2 = np.repeat(np.repeat(roundtrip(cb, C_TABLE), 2, 0), 2, 1)
    cr2 = np.repeat(np.repeat(roundtrip(cr, C_TABLE), 2, 0), 2, 1)
    ycc2 = np.stack([y2, cb2 - 128.0, cr2 - 128.0], axis=-1)
    rgb = np.clip(ycc2 @ _YCBCR2RGB_NP / 255.0, 0, 1)
    return rgb[:h, :w, :].astype(np.float32)


DEFAULT_STAGE_OPTS = dict(
    resize_prob=[0.2, 0.7, 0.1], resize_range=[0.15, 1.5],
    gaussian_noise_prob=0.5, noise_range=[1, 30], poisson_scale_range=[0.05, 3],
    gray_noise_prob=0.4, jpeg_range=[30, 95],
    second_blur_prob=0.8, resize_prob2=[0.3, 0.4, 0.3], resize_range2=[0.3, 1.2],
    gaussian_noise_prob2=0.5, noise_range2=[1, 25], poisson_scale_range2=[0.05, 2.5],
    gray_noise_prob2=0.4, jpeg_range2=[30, 95],
)


class TrainingPairPool:
    """Shuffled training-pair queue (reference _dequeue_and_enqueue :326-367)."""

    def __init__(self, queue_size: int = 180):
        self.queue_size = queue_size
        self.ptr = 0
        self.buffers: dict[str, np.ndarray] | None = None

    def __call__(self, tensors: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        b = next(iter(tensors.values())).shape[0]
        assert self.queue_size % b == 0, f"queue size {self.queue_size} should be divisible by batch size {b}"
        if self.buffers is None:
            self.buffers = {k: np.zeros((self.queue_size,) + v.shape[1:], v.dtype)
                            for k, v in tensors.items()}
        if self.ptr == self.queue_size:
            idx = np.random.permutation(self.queue_size)
            for k in self.buffers:
                self.buffers[k] = self.buffers[k][idx]
            out = {k: self.buffers[k][:b].copy() for k in self.buffers}
            for k, v in tensors.items():
                self.buffers[k][:b] = v
            return out
        for k, v in tensors.items():
            self.buffers[k][self.ptr:self.ptr + b] = v
        self.ptr += b
        return tensors


def _pmap(fn, n, workers=None):
    """Threaded per-image map (cv2/numpy release the GIL)."""
    import concurrent.futures as cf
    import os as _os
    workers = workers or min(n, int(_os.environ.get("DEGRADE_WORKERS", "8")))
    if workers <= 1 or n <= 1:
        return [fn(i) for i in range(n)]
    with cf.ThreadPoolExecutor(workers) as ex:
        return list(ex.map(fn, range(n)))


class RealESRGANDegrader:
    """Two-stage blind degradation for a batch dict with per-item kernels.

    Per-image pixel work is threaded across the batch (DEGRADE_WORKERS, default
    8) so the host pipeline keeps up with the TPU consumer."""

    def __init__(self, opt: dict, scale: int = 4, queue_size: int = 180,
                 use_sharpen: bool = False, sharpen_before: bool = False,
                 degradation_order: str = "two", seed: int | None = None):
        self.o = {**DEFAULT_STAGE_OPTS, **{k: v for k, v in opt.items() if k in DEFAULT_STAGE_OPTS}}
        self.scale = scale
        self.pool = TrainingPairPool(queue_size) if queue_size else None
        self.use_sharpen = use_sharpen
        self.sharpen_before = sharpen_before
        self.order = degradation_order
        self.rng = np.random.RandomState(seed)
        self.pyrng = pyrandom.Random(seed)

    # ------------------------------------------------------------------ stages
    def _jpeg_batch(self, out, jpeg_range):
        """Per-item quality JPEG; native C++ batch kernel when available."""
        b = out.shape[0]
        qualities = [self.rng.uniform(*jpeg_range) for _ in range(b)]
        try:
            from ssl_tpu import native
            if native.available():
                return native.jpeg_roundtrip_batch(np.clip(out, 0, 1), qualities)
        except Exception:
            pass
        return np.stack([jpeg_np(np.clip(out[i], 0, 1), qualities[i]) for i in range(b)])

    def _noise_batch(self, out, stage2=False):
        """Noise family drawn once per batch (reference); per-item sigma/gray.
        Per-item RNG params are drawn up-front (deterministic order), then the
        pixel work fans out across threads."""
        o = self.o
        suf = "2" if stage2 else ""
        b = out.shape[0]
        if self.rng.uniform() < o[f"gaussian_noise_prob{suf}"]:
            lo, hi = o[f"noise_range{suf}"]
            params = [(self.rng.uniform(lo, hi), self.rng.uniform() < o[f"gray_noise_prob{suf}"],
                       self.rng.randint(0, 2**31)) for _ in range(b)]

            def gauss(i):
                sigma, gray, seed = params[i]
                r = np.random.RandomState(seed)
                shape = out[i].shape[:2] + (1,) if gray else out[i].shape
                noise = r.randn(*shape).astype(np.float32) * sigma / 255.0
                return np.clip(out[i] + noise, 0, 1)
            return np.stack(_pmap(gauss, b))
        lo, hi = o[f"poisson_scale_range{suf}"]
        params = [(self.rng.uniform(lo, hi), self.rng.uniform() < o[f"gray_noise_prob{suf}"],
                   self.rng.randint(0, 2**31)) for _ in range(b)]

        def poisson(i):
            scale, gray, seed = params[i]
            r = np.random.RandomState(seed)
            img = out[i]
            base = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[..., None] if gray else img
            flat = (base * 255).round().astype(np.uint8).reshape(-1)
            n_levels = int((np.bincount(flat, minlength=256) > 0).sum())
            vals = max(2.0 ** np.ceil(np.log2(max(n_levels, 2))), 2.0)
            noisy = r.poisson(np.clip(base, 0, 1) * vals) / float(vals)
            return np.clip(img + (noisy - base) * scale, 0, 1)
        return np.stack(_pmap(poisson, b))

    def degrade_batch(self, gt: np.ndarray, kernel1, kernel2, sinc_kernel) -> np.ndarray:
        """gt (b,h,w,3) float32 [0,1]; kernels per item. Returns lq (b,h/s,w/s,3).

        Batch-level randomness (one draw per op per batch) matches the
        reference; blur kernels & JPEG quality are per-item."""
        b, ori_h, ori_w, _ = gt.shape
        o = self.o
        src = gt

        # stage 1 (batch-common draws sampled once, applied per item)
        out = np.stack(_pmap(lambda i: filter2d_np(src[i], kernel1[i]), b))
        out = self._rand_resize_batchdraw(out)
        out = self._noise_batch(out)
        out = self._jpeg_batch(out, o["jpeg_range"])

        if self.order == "two":
            if self.rng.uniform() < o["second_blur_prob"]:
                out = np.stack(_pmap(lambda i: filter2d_np(out[i], kernel2[i]), b))
            out = self._rand_resize_batchdraw(out, stage2=True, base=(ori_h, ori_w))
            out = self._noise_batch(out, stage2=True)
            if self.rng.uniform() < 0.5:
                out = self._final_resize(out, ori_h, ori_w)
                out = np.stack(_pmap(lambda i: filter2d_np(out[i], sinc_kernel[i]), b))
                out = self._jpeg_batch(out, o["jpeg_range2"])
            else:
                out = self._jpeg_batch(out, o["jpeg_range2"])
                out = self._final_resize(out, ori_h, ori_w)
                out = np.stack(_pmap(lambda i: filter2d_np(out[i], sinc_kernel[i]), b))
        else:
            out = self._final_resize(out, ori_h, ori_w)

        return (np.clip((out * 255.0).round(), 0, 255) / 255.0).astype(np.float32)

    def _rand_resize_batchdraw(self, out, stage2=False, base=None):
        o = self.o
        if stage2:
            updown = self.pyrng.choices(["up", "down", "keep"], o["resize_prob2"])[0]
            rrange = o["resize_range2"]
        else:
            updown = self.pyrng.choices(["up", "down", "keep"], o["resize_prob"])[0]
            rrange = o["resize_range"]
        if updown == "up":
            s = self.rng.uniform(1, rrange[1])
        elif updown == "down":
            s = self.rng.uniform(rrange[0], 1)
        else:
            s = 1.0
        mode = self.pyrng.choice(["area", "bilinear", "bicubic"])
        if stage2:
            h = int(base[0] / self.scale * s)
            w = int(base[1] / self.scale * s)
            return np.stack([_resize(out[i], (h, w), mode) for i in range(out.shape[0])])
        return np.stack([_resize(out[i], s, mode) for i in range(out.shape[0])])

    def _final_resize(self, out, ori_h, ori_w):
        mode = self.pyrng.choice(["area", "bilinear", "bicubic"])
        return np.stack([_resize(out[i], (ori_h // self.scale, ori_w // self.scale), mode)
                         for i in range(out.shape[0])])

    # ------------------------------------------------------------------- entry
    def __call__(self, batch: dict) -> dict:
        """Full feed_data equivalent: degrade + random crop + pair pool."""
        from ssl_tpu.data.transforms import paired_random_crop_img_mask
        gt = batch["gt"]
        lq = self.degrade_batch(gt, batch["kernel1"], batch["kernel2"], batch["sinc_kernel"])
        gt_size = batch.get("gt_size", gt.shape[1])
        mask = batch.get("gt_mask")
        if mask is None:
            mask = np.zeros(gt.shape[:3] + (1,), np.float32)
        gts, lqs, masks = [], [], []
        for i in range(gt.shape[0]):
            g, l, m = paired_random_crop_img_mask(gt[i], lq[i], mask[i], gt_size, self.scale,
                                                  rng=self.pyrng)
            gts.append(g); lqs.append(l); masks.append(m)
        tensors = {"gt": np.stack(gts), "lq": np.stack(lqs), "gt_mask": np.stack(masks)}
        if self.pool is not None:
            tensors = self.pool(tensors)
        if self.use_sharpen:
            tensors["gt_usm"] = np.stack([usm_sharp_np(tensors["gt"][i])
                                          for i in range(tensors["gt"].shape[0])])
        return tensors
