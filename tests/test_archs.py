"""Arch unit tests — build tiny nets, assert output shapes (reference test style)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl_tpu.archs import build_network

pytestmark = pytest.mark.slow


def _init_apply(net, x, train=True):
    variables = net.init(jax.random.PRNGKey(0), x)
    try:
        out = net.apply(variables, x, mutable=["batch_stats"])[0]
    except TypeError:
        out = net.apply(variables, x)
    return out


def test_rrdbnet_x4_shape():
    net = build_network(dict(type="RRDBNet", num_in_ch=3, num_out_ch=3,
                             num_feat=8, num_block=2, num_grow_ch=4))
    x = jnp.zeros((1, 12, 12, 3))
    out = _init_apply(net, x)
    assert out.shape == (1, 48, 48, 3)


def test_rdb_split_convs_equivalence():
    """split_convs (by-source kernel regrouping) is the same math and the
    SAME param pytree as the reference's concat formulation: identical init
    under one seed, outputs equal to fp32 roundoff."""
    from ssl_tpu.archs.rrdbnet_arch import ResidualDenseBlock
    x = jnp.asarray(np.random.RandomState(0).rand(2, 12, 12, 16), jnp.float32)
    split = ResidualDenseBlock(num_feat=16, num_grow_ch=8, split_convs=True)
    naive = ResidualDenseBlock(num_feat=16, num_grow_ch=8, split_convs=False)
    v_s = split.init(jax.random.PRNGKey(3), x)
    v_n = naive.init(jax.random.PRNGKey(3), x)
    # identical pytree paths AND identical values (same per-path RNG folding)
    assert jax.tree_util.tree_structure(v_s) == jax.tree_util.tree_structure(v_n)
    for a, b in zip(jax.tree_util.tree_leaves(v_s), jax.tree_util.tree_leaves(v_n)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y_s = split.apply(v_s, x)
    y_n = naive.apply(v_s, x)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_n), atol=2e-6)


def test_rrdbnet_x2_pixel_unshuffle():
    net = build_network(dict(type="RRDBNet", scale=2, num_feat=8, num_block=1, num_grow_ch=4))
    x = jnp.zeros((1, 16, 16, 3))
    out = _init_apply(net, x)
    assert out.shape == (1, 32, 32, 3)


def test_msrresnet_shape():
    net = build_network(dict(type="MSRResNet", num_feat=8, num_block=2, upscale=4))
    out = _init_apply(net, jnp.zeros((2, 8, 8, 3)))
    assert out.shape == (2, 32, 32, 3)


def test_srvgg_shape():
    net = build_network(dict(type="SRVGGNetCompact", num_feat=8, num_conv=2, upscale=4))
    out = _init_apply(net, jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 32, 32, 3)


def test_vgg_style_discriminator():
    net = build_network(dict(type="VGGStyleDiscriminator", num_feat=4, input_size=128))
    x = jnp.zeros((2, 128, 128, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out, _ = net.apply(variables, x, mutable=["batch_stats"])
    assert out.shape == (2, 1)


def test_unet_discriminator_sn():
    net = build_network(dict(type="UNetDiscriminatorSN", num_feat=4))
    x = jnp.zeros((1, 32, 32, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out, _ = net.apply(variables, x, mutable=["batch_stats"])
    assert out.shape == (1, 32, 32, 1)


def test_d_bf16_deviation():
    """bf16 compute_dtype on UNetDiscriminatorSN: the documented precision
    contract — identical param tree (fp32 params + fp32 SN power iterates),
    fp32 logits within ~bf16 rounding of the fp32-compute path, and gradient
    direction preserved.  The D bucket is bandwidth-bound on TPU (BASELINE.md
    MFU table) so bf16 activations are the shipped bench default."""
    d32 = build_network(dict(type="UNetDiscriminatorSN", num_feat=16))
    d16 = build_network(dict(type="UNetDiscriminatorSN", num_feat=16,
                             compute_dtype="bfloat16"))
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = d32.init(jax.random.PRNGKey(1), x)
    # same tree, all fp32 (params AND spectral-norm u/v state)
    assert (jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v)
            == jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                      d16.init(jax.random.PRNGKey(1), x)))
    assert all(str(a.dtype) == "float32" for a in jax.tree_util.tree_leaves(v))

    o32, _ = d32.apply(v, x, mutable=["batch_stats"])
    o16, _ = d16.apply(v, x, mutable=["batch_stats"])
    assert o16.dtype == jnp.float32
    scale = float(jnp.abs(o32).max()) + 1e-12
    assert float(jnp.abs(o32 - o16).max()) / scale < 3e-2  # measured ~8e-3

    def loss(params, net):
        out, _ = net.apply({**v, "params": params}, x, mutable=["batch_stats"])
        return jnp.mean((out - 1.0) ** 2)

    g32 = jax.grad(loss)(v["params"], d32)
    g16 = jax.grad(loss)(v["params"], d16)
    flat32 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g32)])
    flat16 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g16)])
    cos = jnp.vdot(flat32, flat16) / (jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16) + 1e-12)
    assert float(cos) > 0.99, float(cos)


def test_g_bf16_deviation():
    """bf16 compute_dtype on RRDBNet: identical fp32 param tree, fp32 output
    within bf16-rounding of the fp32-compute path, gradient direction
    preserved (same contract as test_d_bf16_deviation; the G trunk is the
    largest step bucket and is bandwidth-leaning — BASELINE.md MFU table)."""
    g32 = build_network(dict(type="RRDBNet", num_feat=16, num_block=3,
                             num_grow_ch=8, scale=4))
    g16 = build_network(dict(type="RRDBNet", num_feat=16, num_block=3,
                             num_grow_ch=8, scale=4, compute_dtype="bfloat16"))
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    v = g32.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v)
            == jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                      g16.init(jax.random.PRNGKey(1), x)))
    assert all(str(a.dtype) == "float32" for a in jax.tree_util.tree_leaves(v))

    o32 = g32.apply(v, x)
    o16 = g16.apply(v, x)
    assert o16.dtype == jnp.float32
    scale = float(jnp.abs(o32).max()) + 1e-12
    assert float(jnp.abs(o32 - o16).max()) / scale < 3e-2

    def loss(params, net):
        return jnp.mean(jnp.abs(net.apply({"params": params}, x) - 1.0))

    g32g = jax.grad(loss)(v["params"], g32)
    g16g = jax.grad(loss)(v["params"], g16)
    flat32 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g32g)])
    flat16 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g16g)])
    cos = jnp.vdot(flat32, flat16) / (jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16) + 1e-12)
    # looser than the D's 0.99: the trunk chains 45 convs of bf16 rounding
    # (measured ~0.966 at this config at random init); training-quality
    # evidence is the on-chip convergence A/B in STATUS §Perf
    assert float(cos) > 0.95, float(cos)


def test_vgg_bf16_deviation():
    """bf16 compute_dtype on VGGFeatureExtractor: identical fp32 param tree,
    fp32 taps within bf16-rounding of the fp32-compute path, and the
    perceptual-loss gradient direction through the tower preserved (same
    contract as test_d_bf16_deviation — the tap feeds an L1 in fp32 either
    way; config key perceptual_opt.compute_dtype)."""
    from ssl_tpu.archs.vgg_arch import VGGFeatureExtractor
    taps = ("conv3_4",)
    m32 = VGGFeatureExtractor(layer_name_list=taps)
    m16 = VGGFeatureExtractor(layer_name_list=taps, compute_dtype="bfloat16")
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = m32.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), v)
            == jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                      m16.init(jax.random.PRNGKey(1), x)))
    assert all(str(a.dtype) == "float32" for a in jax.tree_util.tree_leaves(v))

    o32 = m32.apply(v, x)[taps[0]]
    o16 = m16.apply(v, x)[taps[0]]
    assert o16.dtype == jnp.float32
    scale = float(jnp.abs(o32).max()) + 1e-12
    assert float(jnp.abs(o32 - o16).max()) / scale < 3e-2

    gt = jnp.zeros_like(x)

    def loss(xx, net):
        fx = net.apply(v, xx)[taps[0]]
        fgt = jax.lax.stop_gradient(net.apply(v, gt)[taps[0]])
        return jnp.mean(jnp.abs(fx - fgt))

    g32 = jax.grad(loss)(x, m32)
    g16 = jax.grad(loss)(x, m16)
    cos = jnp.vdot(g32, g16) / (jnp.linalg.norm(g32) * jnp.linalg.norm(g16) + 1e-12)
    assert float(cos) > 0.98, float(cos)


def test_perceptual_loss_runs():
    from ssl_tpu.losses import build_loss
    loss = build_loss(dict(type="PerceptualLoss", layer_weights={"conv3_4": 1.0},
                           perceptual_weight=1.0, style_weight=0.5))
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    gt = jnp.zeros((1, 32, 32, 3))
    p, s = loss(x, gt)
    assert np.isfinite(float(p)) and np.isfinite(float(s))
    p2, _ = loss(gt, gt)
    assert float(p2) == 0.0
