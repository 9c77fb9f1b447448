"""Tensor-parallel diffusion training (parallel/tensor.py).

The reference scales the StableSR-SSL fine-tune with Lightning DDP
(Diffusion-Based-SR/main.py) — pure data parallelism.  Here a 2-D
(data, model) mesh adds Megatron-style tensor sharding of the UNet weights
via GSPMD annotations; these tests pin (a) the partition-spec rules and
(b) train-step equivalence between the single-device step and the dp x tp
sharded step on the virtual 8-CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ssl_tpu.parallel.tensor import (create_dp_tp_mesh, shard_batch_dp,
                                     state_tp_shardings, tp_spec)


def test_tp_spec_rules():
    conv = (3, 3, 16, 64)
    dense = (16, 64)
    # column-parallel: ResBlock conv1 + its time-emb Dense + attention q/k/v
    assert tp_spec(["params", "unet", "input_blocks_1_0", "in_layers_2",
                    "kernel"], conv, 4) == P(None, None, None, "model")
    assert tp_spec(["params", "unet", "input_blocks_1_0", "in_layers_2",
                    "bias"], (64,), 4) == P("model")
    assert tp_spec(["params", "unet", "input_blocks_1_0", "emb_layers_1",
                    "kernel"], dense, 4) == P(None, "model")
    assert tp_spec(["params", "unet", "middle_block_1",
                    "transformer_blocks_0_attn1_to_q", "kernel"],
                   dense, 4) == P(None, "model")
    assert tp_spec(["params", "structcond", "middle_block_1", "qkv",
                    "kernel"], (16, 48), 4) == P(None, "model")
    # row-parallel: ResBlock conv2, attention out-proj
    assert tp_spec(["params", "unet", "input_blocks_1_0", "out_layers_3",
                    "kernel"], conv, 4) == P(None, None, "model", None)
    assert tp_spec(["params", "unet", "input_blocks_1_0", "out_layers_3",
                    "bias"], (64,), 4) == P()        # row bias replicated
    assert tp_spec(["params", "unet", "middle_block_1",
                    "transformer_blocks_0_attn2_to_out_0", "kernel"],
                   dense, 4) == P("model", None)
    # proj_out: row-parallel ONLY for the struct encoder's AttentionBlockQKV
    # (head-sharded input); the UNet transformer's proj_out consumes the
    # replicated post-ff stream
    assert tp_spec(["params", "structcond", "middle_block_1", "proj_out",
                    "kernel"], dense, 4) == P("model", None)
    assert tp_spec(["params", "unet", "middle_block_1", "proj_out",
                    "kernel"], dense, 4) == P()
    # the GroupNorm between the column/row convs rides the sharded channels
    assert tp_spec(["params", "unet", "input_blocks_1_0", "out_layers_0",
                    "scale"], (64,), 4) == P("model")
    # SPADE: shared trunk column, gamma/beta row
    assert tp_spec(["params", "unet", "input_blocks_1_0",
                    "spade_mlp_shared_0", "kernel"], (3, 3, 16, 128), 4) \
        == P(None, None, None, "model")
    assert tp_spec(["params", "unet", "input_blocks_1_0", "spade_mlp_gamma",
                    "kernel"], (3, 3, 128, 64), 4) == P(None, None, "model", None)
    # non-divisible dims fall back to replicated
    assert tp_spec(["params", "unet", "x", "in_layers_2", "kernel"],
                   (3, 3, 16, 6), 4) == P()
    # outside unet/structcond (frozen VAE, null_context) stays replicated
    assert tp_spec(["frozen", "vae", "enc", "in_layers_2", "kernel"],
                   conv, 4) == P()
    assert tp_spec(["params", "null_context"], (4, 32), 4) == P()
    # optimizer moments match by the same path names
    assert tp_spec(["opt_state", "0", "mu", "unet", "b", "in_layers_2",
                    "kernel"], conv, 4) == P(None, None, None, "model")


def _tiny_trainer(mesh=None):
    from ssl_tpu.diffusion import (AutoencoderKL, DiffusionSSLConfig,
                                   EncoderUNetModelWT, StableSRSSL,
                                   UNetModelDualcondV2)
    from ssl_tpu.losses.ssl_loss import SSLSetting
    from ssl_tpu.ops.ssg import SSGConfig
    cfg = DiffusionSSLConfig(timesteps=20, context_dim=32, context_len=4)
    return StableSRSSL(
        cfg,
        unet=UNetModelDualcondV2(model_channels=32, channel_mult=(1, 2),
                                 num_head_channels=8, context_dim=32,
                                 attention_resolutions=(2,)),
        structcond=EncoderUNetModelWT(model_channels=32, channel_mult=(1, 2)),
        vae=AutoencoderKL(ch=16, ch_mult=(1, 2, 2, 2), num_res_blocks=1,
                          embed_dim=4),
        ssl_setting=SSLSetting(ssg=SSGConfig(search=9, window=5),
                               mask_stride=3, capacity=64,
                               l1_weight=0.5, kl_weight=0.5),
        lr=1e-4, mesh=mesh)


@pytest.mark.slow
def test_tp_train_step_matches_single_device():
    """One dp x tp = 2 x 4 train step equals the single-device step, and the
    tensor-parallel leaves are genuinely sharded over the 'model' axis."""
    assert len(jax.devices()) >= 8, "conftest forces an 8-device CPU mesh"
    mesh = create_dp_tp_mesh(2, 4)
    single = _tiny_trainer(None)
    sharded = _tiny_trainer(mesh)

    # independent inits (same seed => identical values): train_step donates
    # its state arg, so the two steps must not share buffers
    state = single.init_state(gt_shape=(2, 32, 32, 3))
    state_tp = sharded.place_state(sharded.init_state(gt_shape=(2, 32, 32, 3)))

    k = state_tp.params["unet"]["input_blocks_1_0"]["in_layers_2"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")
    assert len(k.sharding.device_set) == 8
    mu_k = state_tp.opt_state[0].mu["unet"]["input_blocks_1_0"][
        "in_layers_2"]["kernel"]
    assert mu_k.sharding.spec == P(None, None, None, "model")
    vae_leaf = jax.tree_util.tree_leaves(state_tp.frozen)[0]
    assert vae_leaf.sharding.is_fully_replicated

    rng = np.random.RandomState(0)
    batch = {
        "gt": rng.rand(2, 32, 32, 3).astype(np.float32),
        "lq": rng.rand(2, 32, 32, 3).astype(np.float32),
        "gt_mask": (rng.rand(2, 32, 32, 1) < 0.2).astype(np.float32),
    }
    batch_tp = shard_batch_dp(batch, mesh)
    assert batch_tp["gt"].sharding.spec == P("data")

    s1, logs1 = single.train_step(state, {k: jnp.asarray(v)
                                          for k, v in batch.items()})
    s2, logs2 = sharded.train_step(state_tp, batch_tp)

    for key in ("l_simple", "l_pixel", "l_selfsim", "l_selfsim_kl", "l_total"):
        a, b = float(logs1[key]), float(logs2[key])
        assert np.isfinite(a) and np.isfinite(b)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6, err_msg=key)

    # updated params agree (sharded leaves gather transparently)
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    assert len(p1) == len(p2)
    for a, b in zip(p1[::7], p2[::7]):          # every 7th leaf: cheap + broad
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


@pytest.mark.slow
def test_zero1_moment_sharding_matches_single_device():
    """parallel.zero=true: optimizer moments + EMA of tp-replicated leaves
    shard their largest dim over 'model'; values stay identical."""
    mesh = create_dp_tp_mesh(2, 4)
    single = _tiny_trainer(None)
    sharded = _tiny_trainer(mesh)
    sharded.zero, sharded.zero_min_size = True, 128

    state = single.init_state(gt_shape=(2, 32, 32, 3))
    state_tp = sharded.place_state(sharded.init_state(gt_shape=(2, 32, 32, 3)))

    # a leaf the tp rules leave replicated (time_embed Dense) has its Adam
    # moment sharded under zero; the param itself stays replicated
    mu = state_tp.opt_state[0].mu["unet"]["time_embed_0"]["kernel"]
    assert not mu.sharding.is_fully_replicated
    assert "model" in str(mu.sharding.spec)
    p = state_tp.params["unet"]["time_embed_0"]["kernel"]
    assert p.sharding.is_fully_replicated
    ema = state_tp.ema_params["unet"]["time_embed_0"]["kernel"]
    assert not ema.sharding.is_fully_replicated

    rng = np.random.RandomState(0)
    batch = {
        "gt": rng.rand(2, 32, 32, 3).astype(np.float32),
        "lq": rng.rand(2, 32, 32, 3).astype(np.float32),
        "gt_mask": (rng.rand(2, 32, 32, 1) < 0.2).astype(np.float32),
    }
    s1, logs1 = single.train_step(state, {k: jnp.asarray(v)
                                          for k, v in batch.items()})
    s2, logs2 = sharded.train_step(state_tp, shard_batch_dp(batch, mesh))
    np.testing.assert_allclose(float(logs1["l_total"]), float(logs2["l_total"]),
                               rtol=2e-4, atol=1e-6)
    a = s1.opt_state[0].mu["unet"]["time_embed_0"]["kernel"]
    b = s2.opt_state[0].mu["unet"]["time_embed_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=5e-4, atol=1e-7)
