"""On-device (jit) two-stage blind degradation — the TPU fast path.

Reference semantics: realesrganssl_model.py feed_data (:148-317): per-batch
random draws for resize scale/mode/noise-family/op-order; per-item blur
kernels (from the dataset) and JPEG qualities.

TPU-first design notes (documented divergences from the host parity path in
data/realesr_degradation.py):
- Random-resize changes tensor shapes, which jit cannot express.  The scale
  range is BUCKETED into a static size set and `lax.switch` picks the branch
  (the traced index comes from the PRNG key) — every branch runs resize ->
  noise -> JPEG at its own static size and exits at a common canvas.  The
  reference's continuous scale becomes a 7-point discretization of the same
  range; all other ops are exact.
- Between stages the image passes through a fixed inter-stage canvas (H/2),
  one extra resample vs the reference.
- Resize/noise are otherwise EXACT reference semantics: torch-interpolate
  band matrices (ops/torch_resize.py) for area/bilinear/bicubic, genuine
  per-image-vals Poisson draws, torchvision grayscale coefficients, and the
  shared-gray-field Gaussian quirk (oracle-tested primitives in
  tests/test_degradation_parity.py).

Everything (blur conv, noise, DCT JPEG, sinc) rides the MXU/VPU inside the
train-step jit — zero host work per batch beyond kernel synthesis."""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ssl_tpu.ops.diffjpeg import diff_jpeg
from ssl_tpu.ops.img_process import filter2d


class DegradeJaxConfig(NamedTuple):
    scale: int = 4
    # stage 1
    resize_prob: Sequence[float] = (0.2, 0.7, 0.1)     # up, down, keep
    resize_range: Sequence[float] = (0.15, 1.5)
    gaussian_noise_prob: float = 0.5
    noise_range: Sequence[float] = (1, 30)
    poisson_scale_range: Sequence[float] = (0.05, 3)
    gray_noise_prob: float = 0.4
    jpeg_range: Sequence[float] = (30, 95)
    # stage 2
    second_blur_prob: float = 0.8
    resize_prob2: Sequence[float] = (0.3, 0.4, 0.3)
    resize_range2: Sequence[float] = (0.3, 1.2)
    gaussian_noise_prob2: float = 0.5
    noise_range2: Sequence[float] = (1, 25)
    poisson_scale_range2: Sequence[float] = (0.05, 2.5)
    gray_noise_prob2: float = 0.4
    jpeg_range2: Sequence[float] = (30, 95)
    n_buckets: int = 7


def _resize_to(img, size, method):
    """Exact torch F.interpolate semantics (area = adaptive pool,
    bilinear/bicubic non-antialiased, align_corners=False) via the shared
    band matrices — identical math to the host pipeline's torch_resize_np."""
    from ssl_tpu.ops.torch_resize import interp_torch
    mode = {"area": "area", "linear": "bilinear", "cubic": "bicubic"}[method]
    return interp_torch(img, (size, size), mode)


def _rand_resize_switch(key, img, probs, rrange, base_size, out_common, n_buckets,
                        inner=None, inner_key=None):
    """Pick a bucketed random size via lax.switch; each branch resizes to its
    static size, optionally applies ``inner(key, img)`` AT THAT SIZE (so
    noise/JPEG texture statistics match the host pipeline, which never
    resamples them), then resizes to the common canvas."""
    # bucket sizes spanning [range0, range1] * base (static python ints)
    scales = np.linspace(rrange[0], rrange[1], n_buckets)
    sizes = [max(16, int(round(s * base_size / 8)) * 8) for s in scales]
    k1, k2, k3 = jax.random.split(key, 3)
    updown = jax.random.choice(k1, 3, p=jnp.asarray(probs))  # 0=up,1=down,2=keep
    # map updown to a bucket: up -> scale in [1, hi]; down -> [lo, 1]; keep -> 1
    one_idx = int(np.argmin(np.abs(scales - 1.0)))
    up_idx = jax.random.randint(k2, (), one_idx, n_buckets)
    down_idx = jax.random.randint(k3, (), 0, one_idx + 1)
    idx = jnp.where(updown == 0, up_idx, jnp.where(updown == 1, down_idx, one_idx))
    method_i = jax.random.choice(jax.random.fold_in(key, 7), 3)
    if inner_key is None:
        inner_key = jax.random.fold_in(key, 11)

    def branch(size):
        def run(operands):
            im, m_i, ik = operands
            def to_size(m):
                return lambda: _resize_to(im, size, m)
            mid = lax.switch(m_i, [to_size("area"), to_size("linear"), to_size("cubic")])
            if inner is not None:
                mid = inner(ik, mid)
            # back to the common canvas (same interpolation family)
            def back(m):
                return lambda: _resize_to(mid, out_common, m)
            return lax.switch(m_i, [back("area"), back("linear"), back("cubic")])
        return run

    return lax.switch(idx, [branch(s) for s in sizes], (img, method_i, inner_key))


def _round_uint8_grid(img):
    return jnp.clip(jnp.round(img * 255.0), 0, 255) / 255.0


def _poisson_vals(img_rounded):
    """Per-image vals = 2**ceil(log2(#distinct uint8 levels)) — the unique()
    count as a static-shape 256-bin histogram (jit-friendly)."""
    b = img_rounded.shape[0]
    lv = jnp.round(img_rounded * 255.0).astype(jnp.int32).reshape(b, -1)
    hist = jax.vmap(lambda v: jnp.zeros((256,), jnp.int32).at[v].add(1))(lv)
    n = jnp.sum(hist > 0, axis=1).astype(jnp.float32)
    return (2.0 ** jnp.ceil(jnp.log2(jnp.maximum(n, 1.0)))).reshape(b, 1, 1, 1)


def apply_gaussian_noise_jax(img, sigma, gray, normals_color, normals_gray):
    """Same contract as data.realesr_degradation.apply_gaussian_noise_batch
    (reference random_add_gaussian_noise_pt): per-item sigma/gray, color field
    per item, ONE gray field shared across the batch."""
    noise = normals_color * sigma / 255.0
    noise_gray = normals_gray * sigma / 255.0
    noise = noise * (1 - gray) + noise_gray * gray
    return jnp.clip(img + noise, 0.0, 1.0)


def apply_poisson_noise_jax(key, img, scale, gray):
    """Exact reference Poisson semantics (random_add_poisson_noise_pt):
    uint8-rounded base, per-image vals from the unique-level count,
    torchvision grayscale coefficients; genuine Poisson draws
    (jax.random.poisson), not a Gaussian approximation."""
    kg, kc = jax.random.split(key)
    img_gray = (0.2989 * img[..., 0:1] + 0.587 * img[..., 1:2]
                + 0.114 * img[..., 2:3])
    img_gray = _round_uint8_grid(img_gray)
    vals_g = _poisson_vals(img_gray)
    draw_g = jax.random.poisson(kg, img_gray * vals_g).astype(img.dtype)
    noise_gray = draw_g / vals_g - img_gray
    img_c = _round_uint8_grid(img)
    vals_c = _poisson_vals(img_c)
    draw_c = jax.random.poisson(kc, img_c * vals_c).astype(img.dtype)
    noise = draw_c / vals_c - img_c
    noise = noise * (1 - gray) + noise_gray * gray
    return jnp.clip(img + noise * scale, 0.0, 1.0)


def _add_noise(key, img, cfg: DegradeJaxConfig, stage2: bool):
    gp = cfg.gaussian_noise_prob2 if stage2 else cfg.gaussian_noise_prob
    nr = cfg.noise_range2 if stage2 else cfg.noise_range
    pr = cfg.poisson_scale_range2 if stage2 else cfg.poisson_scale_range
    grayp = cfg.gray_noise_prob2 if stage2 else cfg.gray_noise_prob
    b = img.shape[0]
    kf, ks, kg, kn, kp = jax.random.split(key, 5)
    use_gauss = jax.random.uniform(kf) < gp
    sigma = jax.random.uniform(ks, (b, 1, 1, 1), minval=nr[0], maxval=nr[1])
    gray = (jax.random.uniform(kg, (b, 1, 1, 1)) < grayp).astype(img.dtype)
    gnoise_c = jax.random.normal(kn, img.shape)
    # reference quirk: ONE (h,w) gray field broadcast across the batch
    gnoise_g = jax.random.normal(jax.random.fold_in(kn, 1), (1,) + img.shape[1:3] + (1,))
    gauss_out = apply_gaussian_noise_jax(img, sigma, gray, gnoise_c, gnoise_g)
    pscale = jax.random.uniform(kp, (b, 1, 1, 1), minval=pr[0], maxval=pr[1])
    poisson_out = apply_poisson_noise_jax(jax.random.fold_in(kn, 2), img, pscale, gray)
    return jnp.where(use_gauss, gauss_out, poisson_out)


def _jpeg(key, img, jrange):
    q = jax.random.uniform(key, (img.shape[0],), minval=jrange[0], maxval=jrange[1])
    return diff_jpeg(jnp.clip(img, 0, 1), q)


def degrade_two_stage_jax(key, gt, kernel1, kernel2, sinc_kernel,
                          cfg: DegradeJaxConfig = DegradeJaxConfig()):
    """gt (b,H,H,3) [0,1]; kernels (b,21,21). Returns lq (b,H/scale,H/scale,3).

    Fully jit-compatible; call inside the train step or a jitted input stage."""
    b, H, _, _ = gt.shape
    target = H // cfg.scale
    mid = H // 2
    keys = jax.random.split(key, 12)

    # ---- stage 1 (noise INSIDE the resize branch, at the true random size —
    # the host pipeline never resamples noise texture, and doing so measurably
    # shifted the LQ std; see the drift test.  JPEG stays at the canvas: one
    # compiled DCT pipeline instead of n_buckets copies, at a small documented
    # sharpness drift)
    out = filter2d(gt, kernel1)

    def stage1_ops(k, im):
        return _add_noise(k, im, cfg, stage2=False)

    out = _rand_resize_switch(keys[0], out, cfg.resize_prob, cfg.resize_range,
                              H, mid, cfg.n_buckets, inner=stage1_ops,
                              inner_key=keys[1])
    out = _jpeg(keys[2], out, cfg.jpeg_range)

    # ---- stage 2
    do_blur2 = jax.random.uniform(keys[3]) < cfg.second_blur_prob
    blurred = filter2d(out, kernel2)
    out = jnp.where(do_blur2, blurred, out)

    def stage2_ops(k, im):
        return _add_noise(k, im, cfg, stage2=True)

    out = _rand_resize_switch(keys[4], out, cfg.resize_prob2, cfg.resize_range2,
                              target, target, cfg.n_buckets, inner=stage2_ops,
                              inner_key=keys[5])

    # final: random order of [sinc, JPEG] (already at target size)
    first_sinc = jax.random.uniform(keys[6]) < 0.5
    v1 = _jpeg(keys[7], filter2d(out, sinc_kernel), cfg.jpeg_range2)
    v2 = filter2d(_jpeg(keys[8], out, cfg.jpeg_range2), sinc_kernel)
    out = jnp.where(first_sinc, v1, v2)

    # uint8 rounding like the reference
    out = jnp.clip(jnp.round(out * 255.0), 0, 255) / 255.0
    return out
