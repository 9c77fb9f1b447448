"""Utility tests: matlab resize vs cv2 sanity, edge masks np/jax parity,
color conversion, options parsing, schedules."""
import numpy as np
import jax.numpy as jnp

from ssl_tpu.ops.edge_mask import edge_mask_jax, edge_mask_np
from ssl_tpu.utils.color_util import rgb2ycbcr
from ssl_tpu.utils.matlab_resize import imresize


def test_matlab_imresize_identity_and_shape():
    rng = np.random.RandomState(0)
    img = rng.rand(17, 23, 3)
    down = imresize(img, 0.25)
    assert down.shape == (5, 6, 3)
    up = imresize(img, 2.0)
    assert up.shape == (34, 46, 3)
    # downscale of a constant image stays constant
    const = np.full((16, 16, 3), 0.5)
    d = imresize(const, 0.25)
    np.testing.assert_allclose(d, 0.5, atol=1e-12)


def test_matlab_imresize_against_cv2_ballpark():
    # matlab bicubic (antialiased) should roughly agree with cv2 INTER_AREA
    # on smooth content (sanity only; exact parity is vs MATLAB, not cv2)
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    img = np.stack([yy, xx, yy * xx], -1)
    out = imresize(img, 0.5)
    import cv2
    ref = cv2.resize(img, (16, 16), interpolation=cv2.INTER_AREA)
    assert np.abs(out - ref).mean() < 0.01


def test_edge_mask_np_vs_jax_parity():
    rng = np.random.RandomState(0)
    img = rng.rand(24, 24, 3).astype(np.float32)
    m_np = edge_mask_np(img, threshold=20.0)
    m_j = np.asarray(edge_mask_jax(jnp.asarray(img[None]), threshold=20.0))[0, ..., 0]
    # interior must agree exactly (border handling may differ by 1px policy)
    agree = (m_np[1:-1, 1:-1] == m_j[1:-1, 1:-1]).mean()
    assert agree > 0.99, agree


def test_edge_mask_simmatrix_flavors_oracle():
    """RGB color-mode + LoG ksize parameterization == the diffusion tree's
    generate_mask_simmatrix.py steps (PIL convert -> GaussianBlur(ksize,0)
    -> Laplacian CV_8U -> threshold), executed here as the oracle
    (Diffusion-Based-SR/scripts/data_preparation/generate_mask_simmatrix.py
    :33-55)."""
    import cv2
    from PIL import Image

    rng = np.random.RandomState(3)
    img = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
    for color_mode, thr in (("L", 20.0), ("RGB", 20.0)):
        # oracle: the reference's own op sequence
        ref_src = np.array(Image.fromarray(img).convert(color_mode))
        for use_log, k in ((False, 0), (True, 5)):
            src = ref_src
            if use_log:
                src = cv2.GaussianBlur(src=src, ksize=(k, k), sigmaX=0,
                                       sigmaY=0, dst=-1)
            grad = cv2.Laplacian(src, cv2.CV_8U)
            want = (grad > thr).astype(np.float32)
            got = edge_mask_np(img, thr, use_log=use_log, log_ksize=k,
                               color_mode=color_mode)
            np.testing.assert_array_equal(got, want)
            assert got.ndim == (3 if color_mode == "RGB" else 2)


def test_edge_mask_detects_edges():
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 1.0
    m = edge_mask_np(img, threshold=20.0)
    assert m[:, 15:17].sum() > 0
    assert m[:, :10].sum() == 0


def test_rgb2ycbcr_known_values():
    white = np.ones((1, 1, 3), np.float32)
    y = rgb2ycbcr(white, y_only=True)
    assert abs(float(y) - 235.0 / 255.0) < 1e-3
    black = np.zeros((1, 1, 3), np.float32)
    y = rgb2ycbcr(black, y_only=True)
    assert abs(float(y) - 16.0 / 255.0) < 1e-3


def test_lr_schedules():
    from ssl_tpu.models.lr_scheduler import build_schedule, multi_step_lr
    s = multi_step_lr(1e-4, [10, 20], 0.5)
    assert abs(float(s(0)) - 1e-4) < 1e-9
    assert abs(float(s(10)) - 5e-5) < 1e-9
    assert abs(float(s(25)) - 2.5e-5) < 1e-9
    cos = build_schedule({"scheduler": {"type": "CosineAnnealingRestartLR",
                                        "periods": [10, 10], "restart_weights": [1, 0.5]},
                          "warmup_iter": -1}, 1e-4)
    assert abs(float(cos(0)) - 1e-4) < 1e-6
    assert float(cos(9)) < 1e-5


def test_options_force_yml():
    from ssl_tpu.utils.options import set_by_dotted
    opt = {"train": {"total_iter": 100}}
    set_by_dotted(opt, "train:total_iter=5")
    assert opt["train"]["total_iter"] == 5
    set_by_dotted(opt, "val:metrics:psnr:crop_border=4")
    assert opt["val"]["metrics"]["psnr"]["crop_border"] == 4
