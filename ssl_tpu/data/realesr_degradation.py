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
    """Exact torch ``F.interpolate`` semantics (reference feed_data resizes
    with area/bilinear/bicubic, align_corners=False, no antialias —
    oracle-tested in tests/test_degradation_parity.py).  scale_factor maps to
    floor(dim*scale) like torch."""
    from ssl_tpu.ops.torch_resize import torch_resize_np
    if isinstance(size_or_scale, tuple):
        return torch_resize_np(img, size_or_scale, mode)
    s = size_or_scale
    h, w = img.shape[:2]
    return torch_resize_np(img, (int(h * s), int(w * s)), mode, scale=float(s))


def _rgb_to_grayscale(img: np.ndarray) -> np.ndarray:
    """torchvision functional_tensor.rgb_to_grayscale coefficients (the
    reference's generate_poisson_noise_pt gray path — note 0.2989, not
    cv2's 0.299)."""
    return (0.2989 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])[..., None]


def _round_uint8_grid(img: np.ndarray) -> np.ndarray:
    return np.clip((img * 255.0).round(), 0, 255).astype(np.float32) / 255.0


def _poisson_vals(img_rounded: np.ndarray) -> float:
    """reference: vals = 2**ceil(log2(len(unique(img)))) on the uint8-rounded
    image (all channels jointly).  Distinct float values of the rounded image
    == distinct uint8 levels -> O(n) bincount."""
    flat = (img_rounded * 255.0).round().astype(np.uint8).reshape(-1)
    n_levels = int((np.bincount(flat, minlength=256) > 0).sum())
    return float(2.0 ** np.ceil(np.log2(max(n_levels, 1))))


def apply_gaussian_noise_batch(out: np.ndarray, sigma: np.ndarray, gray: np.ndarray,
                               normals_color: np.ndarray,
                               normals_gray: np.ndarray | None) -> np.ndarray:
    """random_add_gaussian_noise_pt semantics (degradations.py:492-556) given
    explicit draws: per-item sigma (b,), per-item gray flag (b,), color field
    (b,h,w,3) and ONE gray field (h,w) shared across the batch (the
    reference's broadcasting quirk: torch.randn(h,w) * sigma(b,1,1,1)).
    clip=True rounds=False."""
    sigma = sigma.reshape(-1, 1, 1, 1).astype(np.float32)
    gray = gray.reshape(-1, 1, 1, 1).astype(np.float32)
    noise = normals_color.astype(np.float32) * sigma / 255.0
    if normals_gray is not None and gray.any():
        noise_gray = normals_gray.astype(np.float32)[None, :, :, None] * sigma / 255.0
        noise = noise * (1 - gray) + noise_gray * gray
    return np.clip(out + noise, 0, 1)


def apply_poisson_noise_batch(out: np.ndarray, scale: np.ndarray, gray: np.ndarray,
                              poisson_fn=None) -> np.ndarray:
    """random_add_poisson_noise_pt semantics (degradations.py:609-730) given
    explicit draws: the image is uint8-rounded FIRST (both lam and the
    subtracted base), vals per item from the unique-level count, gray via
    torchvision grayscale coefficients.  ``poisson_fn(lam)`` supplies the
    Poisson draws (default np.random)."""
    if poisson_fn is None:
        poisson_fn = np.random.poisson
    b = out.shape[0]
    scale = scale.reshape(-1, 1, 1, 1).astype(np.float32)
    gray = gray.reshape(-1, 1, 1, 1).astype(np.float32)
    any_gray = bool((gray > 0).any())
    if any_gray:
        img_gray = _round_uint8_grid(_rgb_to_grayscale(out))
        vals_g = np.array([_poisson_vals(img_gray[i]) for i in range(b)],
                          np.float32).reshape(-1, 1, 1, 1)
        draw_g = poisson_fn(img_gray * vals_g).astype(np.float32)
        noise_gray = draw_g / vals_g - img_gray          # (b,h,w,1) -> bcast 3ch
    img_c = _round_uint8_grid(out)
    vals_c = np.array([_poisson_vals(img_c[i]) for i in range(b)],
                      np.float32).reshape(-1, 1, 1, 1)
    draw_c = poisson_fn(img_c * vals_c).astype(np.float32)
    noise = draw_c / vals_c - img_c
    if any_gray:
        noise = noise * (1 - gray) + noise_gray * gray
    return np.clip(out + noise * scale, 0, 1)


def jpeg_np(img: np.ndarray, quality: float) -> np.ndarray:
    """DCT-based JPEG round-trip, numpy (same math as ops/diffjpeg.diff_jpeg)."""
    h, w = img.shape[:2]
    ph, pw = (16 - h % 16) % 16, (16 - w % 16) % 16
    # constant-0 pad like the reference DiffJPEG (diffjpeg.py:486)
    x = np.pad(img, ((0, ph), (0, pw), (0, 0))) * 255.0
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
    def _jpeg_batch(self, out, qualities):
        """Per-item quality JPEG; native C++ batch kernel when available."""
        b = out.shape[0]
        qualities = [float(q) for q in qualities]
        try:
            from ssl_tpu import native
            if native.available():
                return native.jpeg_roundtrip_batch(np.clip(out, 0, 1), qualities)
        except Exception:
            pass
        return np.stack([jpeg_np(np.clip(out[i], 0, 1), qualities[i]) for i in range(b)])

    def _draw_noise_params(self, b: int, stage2: bool) -> dict:
        o = self.o
        suf = "2" if stage2 else ""
        use_gauss = bool(self.rng.uniform() < o[f"gaussian_noise_prob{suf}"])
        if use_gauss:
            lo, hi = o[f"noise_range{suf}"]
        else:
            lo, hi = o[f"poisson_scale_range{suf}"]
        return {
            "use_gauss": use_gauss,
            "level": self.rng.uniform(lo, hi, size=b),
            "gray": self.rng.uniform(size=b) < o[f"gray_noise_prob{suf}"],
            "normals": None, "normals_gray": None, "poisson": None,
        }

    def draw_plan(self, b: int) -> dict:
        """Sample every batch-level decision + per-item parameter for one
        degrade_batch call (the injectable seam the oracle-parity tests use:
        tests/test_degradation_parity.py freezes this plan on both sides)."""
        o = self.o

        def rand_resize(stage2):
            suf = "2" if stage2 else ""
            updown = self.pyrng.choices(["up", "down", "keep"], o[f"resize_prob{suf}"])[0]
            rrange = o[f"resize_range{suf}"]
            if updown == "up":
                s = float(self.rng.uniform(1, rrange[1]))
            elif updown == "down":
                s = float(self.rng.uniform(rrange[0], 1))
            else:
                s = 1.0
            mode = self.pyrng.choice(["area", "bilinear", "bicubic"])
            return s, mode

        s1, m1 = rand_resize(False)
        plan = {
            "scale1": s1, "mode1": m1,
            "noise1": self._draw_noise_params(b, False),
            "jpeg_q1": self.rng.uniform(*o["jpeg_range"], size=b),
        }
        if self.order == "two":
            s2, m2 = rand_resize(True)
            plan.update({
                "second_blur": bool(self.rng.uniform() < o["second_blur_prob"]),
                "scale2": s2, "mode2": m2,
                "noise2": self._draw_noise_params(b, True),
                "sinc_first": bool(self.rng.uniform() < 0.5),
                "final_mode": self.pyrng.choice(["area", "bilinear", "bicubic"]),
                "jpeg_q2": self.rng.uniform(*o["jpeg_range2"], size=b),
            })
        return plan

    def _apply_noise(self, out: np.ndarray, p: dict) -> np.ndarray:
        level = np.asarray(p["level"], np.float32)
        gray = np.asarray(p["gray"], np.float32)
        if p["use_gauss"]:
            normals = p["normals"]
            if normals is None:
                normals = self.rng.randn(*out.shape)
            normals_gray = p["normals_gray"]
            if normals_gray is None and gray.any():
                normals_gray = self.rng.randn(*out.shape[1:3])
            return apply_gaussian_noise_batch(out, level, gray, normals, normals_gray)
        poisson_fn = p["poisson"] or self.rng.poisson
        return apply_poisson_noise_batch(out, level, gray, poisson_fn)

    def degrade_batch(self, gt: np.ndarray, kernel1, kernel2, sinc_kernel,
                      plan: dict | None = None) -> np.ndarray:
        """gt (b,h,w,3) float32 [0,1]; kernels per item. Returns lq (b,h/s,w/s,3).

        Batch-level randomness (one draw per op per batch) matches the
        reference feed_data (:171-302); pass ``plan`` (see draw_plan) to
        freeze every random decision."""
        b, ori_h, ori_w, _ = gt.shape
        src = gt
        if plan is None:
            plan = self.draw_plan(b)

        # stage 1
        out = np.stack(_pmap(lambda i: filter2d_np(src[i], kernel1[i]), b))
        out = np.stack([_resize(out[i], plan["scale1"], plan["mode1"]) for i in range(b)])
        out = self._apply_noise(out, plan["noise1"])
        out = self._jpeg_batch(out, plan["jpeg_q1"])

        if self.order == "two":
            if plan["second_blur"]:
                out = np.stack(_pmap(lambda i: filter2d_np(out[i], kernel2[i]), b))
            h2 = int(ori_h / self.scale * plan["scale2"])
            w2 = int(ori_w / self.scale * plan["scale2"])
            out = np.stack([_resize(out[i], (h2, w2), plan["mode2"]) for i in range(b)])
            out = self._apply_noise(out, plan["noise2"])
            target = (ori_h // self.scale, ori_w // self.scale)
            if plan["sinc_first"]:
                out = np.stack([_resize(out[i], target, plan["final_mode"]) for i in range(b)])
                out = np.stack(_pmap(lambda i: filter2d_np(out[i], sinc_kernel[i]), b))
                out = self._jpeg_batch(out, plan["jpeg_q2"])
            else:
                out = self._jpeg_batch(out, plan["jpeg_q2"])
                out = np.stack([_resize(out[i], target, plan["final_mode"]) for i in range(b)])
                out = np.stack(_pmap(lambda i: filter2d_np(out[i], sinc_kernel[i]), b))
        else:
            # order 'one': the final resize reuses the stage-1 mode (:204)
            target = (ori_h // self.scale, ori_w // self.scale)
            out = np.stack([_resize(out[i], target, plan["mode1"]) for i in range(b)])

        return (np.clip((out * 255.0).round(), 0, 255) / 255.0).astype(np.float32)

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
