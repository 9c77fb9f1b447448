"""Flash-attention option (ops/attention.py): einsum fallback semantics on
CPU, flag threading through the diffusion UNet/VAE (no param-tree change),
and value/grad equivalence vs the einsum path when a TPU is present."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssl_tpu.ops.attention import flash_eligible, sdp_attention


def test_flash_eligibility_rules():
    on_tpu = jax.default_backend() == "tpu"
    assert flash_eligible(4096, 4096, True) == on_tpu
    assert flash_eligible(4096, 77, True) is False       # cross-attn context
    assert flash_eligible(256, 256, True) is False       # too short to win
    assert flash_eligible(4096, 4096, False) is False


def test_sdp_attention_matches_manual_softmax():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 16, 3, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 10, 3, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 10, 3, 8).astype(np.float32))
    out = sdp_attention(q, k, v, 8 ** -0.5, use_flash=True)  # ineligible -> einsum
    attn = jax.nn.softmax(jnp.einsum("bnhd,bmhd->bhnm", q, k) * 8 ** -0.5, -1)
    want = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_flash_flag_does_not_change_param_tree():
    """use_flash_attention is pure schedule: identical param pytree + CPU
    outputs for the UNet and the VAE."""
    from ssl_tpu.diffusion.unet import EncoderUNetModelWT
    from ssl_tpu.diffusion.vae import AutoencoderKL

    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 4), jnp.float32)
    t = jnp.zeros((1,))
    outs, trees = [], []
    for flag in (False, True):
        net = EncoderUNetModelWT(model_channels=32, num_res_blocks=1,
                                 channel_mult=(1, 2), attention_resolutions=(2,),
                                 num_heads=4, use_flash_attention=flag)
        v = net.init(jax.random.PRNGKey(0), x, t)
        trees.append(jax.tree_util.tree_structure(v))
        outs.append(net.apply(v, x, t))
    assert trees[0] == trees[1]
    for k in outs[0]:
        np.testing.assert_array_equal(np.asarray(outs[0][k]), np.asarray(outs[1][k]))

    img = jnp.asarray(np.random.RandomState(1).rand(1, 16, 16, 3), jnp.float32)
    outs = []
    for flag in (False, True):
        vae = AutoencoderKL(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                            use_flash_attention=flag)
        v = vae.init(jax.random.PRNGKey(0), img)
        outs.append(vae.apply(v, img, sample_posterior=False)[0])
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="flash kernel lowers on TPU only")
def test_flash_matches_einsum_on_tpu():
    """Value + gradient equivalence at an eligible shape (4096 tokens)."""
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 1024, 4, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1024, 4, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 1024, 4, 64).astype(np.float32))

    def loss(qq, use_flash):
        return jnp.sum(sdp_attention(qq, k, v, 64 ** -0.5, use_flash) ** 2)

    f_val, f_grad = jax.value_and_grad(loss)(q, True)
    e_val, e_grad = jax.value_and_grad(loss)(q, False)
    np.testing.assert_allclose(float(f_val), float(e_val), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(f_grad), np.asarray(e_grad),
                               rtol=2e-2, atol=2e-2)
