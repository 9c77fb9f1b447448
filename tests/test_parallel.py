"""Multi-device tests on the forced 8-device CPU mesh (SURVEY §2.8 parity:
the reference could not test DDP without a cluster; the mesh makes it free)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from ssl_tpu.parallel.mesh import batch_sharding, create_mesh, replicate_sharding, shard_batch


pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")]


def test_mesh_and_batch_sharding():
    mesh = create_mesh()
    assert mesh.devices.size == len(jax.devices())
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1), "name": ["a"]}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.is_equivalent_to(batch_sharding(mesh), 2)
    assert sharded["name"] == ["a"]


def test_data_parallel_gradient_allreduce():
    """Grad of a replicated-param model over a sharded batch must equal the
    single-device grad (XLA inserts the all-reduce)."""
    mesh = create_mesh()
    params = jnp.asarray([[2.0]])
    x = np.arange(8, dtype=np.float32).reshape(8, 1)

    def loss(p, xb):
        return jnp.mean((xb @ p - 1.0) ** 2)

    g_single = jax.grad(loss)(params, jnp.asarray(x))

    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    ps = jax.device_put(params, replicate_sharding(mesh))
    g_sharded = jax.jit(jax.grad(loss))(ps, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single), rtol=1e-6)


def test_ssl_loss_under_sharding():
    """The dense SSL loss partitions over the batch axis without reshards."""
    from ssl_tpu.losses.ssl_loss import SSLSetting, ssl_loss
    from ssl_tpu.ops.ssg import SSGConfig
    mesh = create_mesh()
    rng = np.random.RandomState(0)
    b, h = 8, 16
    sr = jnp.asarray(rng.rand(b, h, h, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(b, h, h, 3), jnp.float32)
    mask = jnp.asarray(rng.rand(b, h, h, 1) < 0.3, jnp.float32)
    s = SSLSetting(ssg=SSGConfig(search=7, window=3), impl="dense")
    l1_ref, kl_ref = ssl_loss(sr, gt, mask, s)
    bs = batch_sharding(mesh)
    l1_sh, kl_sh = jax.jit(lambda a, b_, m: ssl_loss(a, b_, m, s))(
        jax.device_put(sr, bs), jax.device_put(gt, bs), jax.device_put(mask, bs))
    np.testing.assert_allclose(float(l1_sh), float(l1_ref), rtol=1e-5)
    np.testing.assert_allclose(float(kl_sh), float(kl_ref), rtol=1e-5)


def test_fsdp_param_sharding_train_step():
    """2-D mesh (data x fsdp): stacked RRDB block params shard over 'fsdp',
    batch over 'data'; one full SR train step runs and matches replicated."""
    from ssl_tpu.models import build_model
    from ssl_tpu.parallel.fsdp import batch_sharding_2d, create_2d_mesh, shard_state
    opt = {
        "name": "fsdp", "model_type": "SRModel", "scale": 4, "is_train": True,
        "manual_seed": 0, "datasets": {"train": {"gt_size": 32}},
        "network_g": {"type": "RRDBNet", "num_feat": 8, "num_block": 4, "num_grow_ch": 4},
        "path": {},
        "train": {"ema_decay": 0.999, "optim_g": {"type": "Adam", "lr": 1e-4},
                  "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0}},
    }
    model = build_model(opt)
    state = model.init_state(lq_shape=(4, 8, 8, 3))
    rng = np.random.RandomState(0)
    batch = {"lq": jnp.asarray(rng.rand(4, 8, 8, 3), jnp.float32),
             "gt": jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)}

    ref_state, ref_logs = jax.jit(model.make_train_step())(state, batch)
    ref_loss = float(ref_logs["l_pix"])

    mesh = create_2d_mesh(4, 2)
    state2 = model.init_state(lq_shape=(4, 8, 8, 3))
    state2 = shard_state(state2, mesh, min_size=32)
    bs = batch_sharding_2d(mesh)
    batch2 = {k: jax.device_put(v, bs) for k, v in batch.items()}
    # input params really are fsdp-sharded (stacked block leaves)
    shardings = [l.sharding.is_fully_replicated
                 for l in jax.tree_util.tree_leaves(state2.params_g["body"])]
    assert not all(shardings)
    new_state, logs = jax.jit(model.make_train_step())(state2, batch2)
    assert abs(float(logs["l_pix"]) - ref_loss) / (ref_loss + 1e-12) < 1e-5
