"""Tests for StyleGAN resample ops + deformable conv (TPU-native N2-N4)."""
import numpy as np
import jax
import jax.numpy as jnp

from ssl_tpu.ops.stylegan_ops import (downsample2x, fused_leaky_relu,
                                      make_resample_kernel, upfirdn2d, upsample2x)
from ssl_tpu.ops.deform_conv import DCNv2Pack, modulated_deform_conv2d


def test_fused_leaky_relu():
    x = jnp.asarray([[-1.0, 2.0]])
    b = jnp.asarray([0.5, -0.5])
    out = np.asarray(fused_leaky_relu(x, b))
    expected = np.array([[-0.5 * 0.2, 1.5]]) * np.sqrt(2)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_upfirdn2d_identity():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 2), jnp.float32)
    k = jnp.asarray([[1.0]])
    out = upfirdn2d(x, k, up=1, down=1, pad=(0, 0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


def test_up_down_roundtrip_shapes():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3), jnp.float32)
    up = upsample2x(x)
    assert up.shape == (1, 16, 16, 3)
    down = downsample2x(up)
    assert down.shape == (1, 8, 8, 3)
    # lowpass round-trip approximately preserves a constant image
    const = jnp.ones((1, 8, 8, 1))
    rt = downsample2x(upsample2x(const))
    np.testing.assert_allclose(np.asarray(rt)[0, 2:-2, 2:-2, 0], 1.0, atol=1e-3)


def test_deform_conv_zero_offset_matches_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 8, 8, 4), jnp.float32)
    w = jnp.asarray(rng.rand(3, 3, 4, 6), jnp.float32)
    offset = jnp.zeros((1, 8, 8, 2 * 9))
    mask = jnp.ones((1, 8, 8, 9))
    out = modulated_deform_conv2d(x, offset, mask, w, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_dcnv2pack_zero_init_identity_offsets():
    rng = jax.random.PRNGKey(0)
    params = DCNv2Pack.init_params(rng, cin=4, cout=4)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 8, 8, 4), jnp.float32)
    out = DCNv2Pack.apply(params, x, x)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_jnp_filter2d_matches_cv2():
    from ssl_tpu.ops.img_process import filter2d, usm_sharp
    from ssl_tpu.data.realesr_degradation import filter2d_np
    rng = np.random.RandomState(0)
    img = rng.rand(2, 16, 16, 3).astype(np.float32)
    ker = rng.rand(2, 5, 5).astype(np.float32)
    ker /= ker.sum(axis=(1, 2), keepdims=True)
    out = np.asarray(filter2d(jnp.asarray(img), jnp.asarray(ker)))
    ref = np.stack([filter2d_np(img[i], ker[i]) for i in range(2)])
    assert np.abs(out - ref).max() < 1e-5
    s = usm_sharp(jnp.asarray(img))
    assert s.shape == img.shape and np.isfinite(np.asarray(s)).all()


def test_deform_attn_zero_offset_equals_window_attention():
    """With zero offsets, deform_attn == plain window attention over the
    kernel neighborhood (zero-padded) — the identity the reference op
    satisfies by construction (deform_attn_cuda_pt110.cpp:84-111)."""
    import jax
    import jax.numpy as jnp
    from ssl_tpu.ops.deform_attn import deform_attn

    rng = np.random.RandomState(0)
    b, h, w, c, heads, dg, kk = 1, 6, 5, 8, 2, 2, 3
    K = kk * kk
    q = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    kmap = jnp.asarray(rng.rand(b, 1, h, w, c), jnp.float32)
    vmap_ = jnp.asarray(rng.rand(b, 1, h, w, c), jnp.float32)
    kv = jnp.concatenate([kmap, vmap_], axis=-1)
    off = jnp.zeros((b, h, w, 1 * dg * K * 2))
    out = np.asarray(deform_attn(q, kv, off, kk, kk, heads, dg))

    # naive oracle
    hd = c // heads
    kp = np.pad(np.asarray(kmap)[0, 0], ((1, 1), (1, 1), (0, 0)))
    vp = np.pad(np.asarray(vmap_)[0, 0], ((1, 1), (1, 1), (0, 0)))
    expect = np.zeros((h, w, c))
    qn = np.asarray(q)[0]
    for y in range(h):
        for x in range(w):
            keys = kp[y:y + 3, x:x + 3].reshape(K, heads, hd)
            vals = vp[y:y + 3, x:x + 3].reshape(K, heads, hd)
            qh = qn[y, x].reshape(heads, hd) * (hd ** -0.5)
            logit = np.einsum("hd,khd->hk", qh, keys)
            a = np.exp(logit - logit.max(-1, keepdims=True))
            a /= a.sum(-1, keepdims=True)
            expect[y, x] = np.einsum("hk,khd->hd", a, vals).reshape(c)
    np.testing.assert_allclose(out[0], expect, rtol=1e-5, atol=1e-6)


def test_deform_attn_pack_runs_and_grads():
    import jax
    import jax.numpy as jnp
    from ssl_tpu.ops.deform_attn import DeformAttnPack

    rng = np.random.RandomState(1)
    b, h, w, c = 1, 4, 4, 8
    params = DeformAttnPack.init_params(jax.random.PRNGKey(0), c, clip_size=2,
                                        deform_groups=2)
    q = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    k = jnp.asarray(rng.rand(b, 2, h, w, c), jnp.float32)
    v = jnp.asarray(rng.rand(b, 2, h, w, c), jnp.float32)
    out = DeformAttnPack.apply(params, q, k, v, heads=2, deform_groups=2)
    assert out.shape == (b, h, w, c)
    g = jax.grad(lambda p: jnp.sum(
        DeformAttnPack.apply(p, q, k, v, heads=2, deform_groups=2) ** 2))(params)
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(g)[0])).all()
