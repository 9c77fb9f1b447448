"""Model integration tests: option-dict-driven train steps on synthetic data
(reference test style: tests/test_models/test_sr_model.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ssl_tpu.models import build_model

pytestmark = pytest.mark.slow


def _tiny_opt(model_type="SRModel", with_d=False, with_ssl=False):
    opt = {
        "name": "tiny", "model_type": model_type, "scale": 4, "is_train": True,
        "manual_seed": 0, "num_gpu": 1,
        "datasets": {"train": {"gt_size": 32}},
        "network_g": {"type": "MSRResNet", "num_in_ch": 3, "num_out_ch": 3,
                      "num_feat": 8, "num_block": 1, "upscale": 4},
        "path": {},
        "train": {
            "ema_decay": 0.999,
            "optim_g": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [5], "gamma": 0.5},
            "total_iter": 10, "warmup_iter": -1,
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0, "reduction": "mean"},
        },
        "val": {"metrics": {"psnr": {"type": "calculate_psnr", "crop_border": 4,
                                     "test_y_channel": False}}},
    }
    if with_d:
        opt["network_d"] = {"type": "UNetDiscriminatorSN", "num_in_ch": 3, "num_feat": 4}
        opt["train"]["optim_d"] = {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]}
        opt["train"]["gan_opt"] = {"type": "GANLoss", "gan_type": "vanilla",
                                   "real_label_val": 1.0, "fake_label_val": 0.0,
                                   "loss_weight": 5e-3}
    if with_ssl:
        opt["ssl_setting"] = {"mask_stride": 3, "ssl_mode": "jax",
                              "kernel_size_search": 9, "sigma": 0.004,
                              "kernel_size_window": 5, "generalization": True,
                              "capacity": 64}
        opt["train"]["selfsim_opt"] = {"type": "L1Loss", "loss_weight": 1e3, "reduction": "mean"}
        opt["train"]["selfsim1_opt"] = {"type": "KLDistanceLoss", "loss_weight": 1e3,
                                        "reduction": "mean", "softmax": False}
    return opt


def _batch(b=2, lq=8, scale=4, with_mask=False, seed=0):
    rng = np.random.RandomState(seed)
    d = {"lq": rng.rand(b, lq, lq, 3).astype(np.float32),
         "gt": rng.rand(b, lq * scale, lq * scale, 3).astype(np.float32)}
    if with_mask:
        d["gt_mask"] = (rng.rand(b, lq * scale, lq * scale, 1) < 0.2).astype(np.float32)
    return d


def test_sr_model_train_step_and_ema():
    model = build_model(_tiny_opt())
    state = model.init_state(lq_shape=(2, 8, 8, 3))
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}
    # NOTE: train_step donates its input state; don't touch `state` afterwards.
    state2, logs = model.train_step(state, batch)
    assert int(state2.step) == 1
    assert np.isfinite(float(logs["l_pix"]))
    e2 = np.asarray(next(iter(jax.tree_util.tree_leaves(state2.ema_params_g))))
    assert np.isfinite(e2).all()
    # loss decreases over a few steps on a fixed batch
    losses = [float(logs["l_pix"])]
    for _ in range(3):
        state2, logs = model.train_step(state2, batch)
        losses.append(float(logs["l_pix"]))
    assert losses[-1] <= losses[0]


def test_esrgan_model_gan_step():
    model = build_model(_tiny_opt("ESRGANModel", with_d=True))
    state = model.init_state(lq_shape=(2, 8, 8, 3))
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}
    state2, logs = model.train_step(state, batch)
    for key in ("l_g_gan", "l_d_real", "l_d_fake", "out_d_real", "out_d_fake"):
        assert np.isfinite(float(logs[key])), key


def test_fused_d_pair_matches_serial():
    """apply_d_pair (stacked real+fake D dispatch) vs the reference's serial
    two-call trajectory: the only divergence is which SN power-iteration u
    the fake pass sees (pre- vs post-real-update).  At random init u is far
    from the top singular vector and one iteration moves sigma a lot, so the
    comparison warms u up first (5 serial steps), then takes ONE step with
    each variant from the identical warmed state."""
    import copy

    import jax as _jax
    opt = _tiny_opt("ESRGANModel", with_d=True)
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}
    models = {}
    for fused in (True, False):
        o = copy.deepcopy(opt)
        o["train"]["fuse_d_batch"] = fused
        models[fused] = build_model(o)
    state = models[False].init_state(lq_shape=(2, 8, 8, 3))
    for _ in range(5):                      # converge the SN power iteration
        state, _ = models[False].train_step(state, batch)
    logs = {}
    for fused in (True, False):             # one step each from the SAME state
        s = _jax.tree.map(jnp.copy, state)  # train_step donates its input
        _, logs[fused] = models[fused].train_step(s, batch)
    for key in ("l_g_gan", "l_d_real", "l_d_fake", "out_d_real", "out_d_fake"):
        a, b = float(logs[True][key]), float(logs[False][key])
        assert abs(a - b) < 2e-3 * max(1.0, abs(b)), (key, a, b)


def test_esrganssl_full_recipe():
    model = build_model(_tiny_opt("ESRGANSSLModel", with_d=True, with_ssl=True))
    state = model.init_state(lq_shape=(2, 8, 8, 3))
    batch = {k: jnp.asarray(v) for k, v in _batch(with_mask=True).items()}
    state2, logs = model.train_step(state, batch)
    assert np.isfinite(float(logs["l_selfsim"]))
    assert np.isfinite(float(logs["l_selfsim_kl"]))
    assert float(logs["l_selfsim"]) > 0
    # second step exercises donated-buffer path
    state3, logs3 = model.train_step(state2, batch)
    assert int(state3.step) == 2


def test_test_and_validation_shapes(tmp_path):
    model = build_model(_tiny_opt())
    state = model.init_state(lq_shape=(1, 8, 8, 3))
    sr = model.test(state, np.random.rand(1, 10, 11, 3).astype(np.float32))
    assert sr.shape == (1, 40, 44, 3)


def test_tile_process():
    opt = _tiny_opt()
    opt["tile_process"] = True
    opt["tile_size"] = 8
    opt["tile_pad"] = 2
    model = build_model(opt)
    state = model.init_state(lq_shape=(1, 12, 12, 3))
    lq = np.random.rand(1, 12, 12, 3).astype(np.float32)
    sr_tiled = model.test(state, lq)
    assert sr_tiled.shape == (1, 48, 48, 3)
    # tiling should approximate the direct forward
    opt2 = _tiny_opt()
    model2 = build_model(opt2)
    sr_direct = model2.test(state, lq)
    assert np.abs(sr_tiled - sr_direct).mean() < 2e-2


import jax  # noqa: E402


def test_relativistic_d_split_equivalence():
    """SURVEY §7.3: the reference does two separate D backwards (real then
    fake — a DDP-BatchNorm workaround, esrganssl_model.py:251-274); our single
    combined loss must produce identical gradients."""
    model = build_model(_tiny_opt("ESRGANModel", with_d=True))
    state = model.init_state(lq_shape=(2, 8, 8, 3))
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    sr = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)

    def combined(params_d):
        real_pred, s1 = model.apply_d(params_d, state.stats_d, gt, True, True)
        fake_pred, _ = model.apply_d(params_d, s1, sr, True, True)
        loss, _ = model.gan_d_loss(real_pred, fake_pred)
        return loss

    def split(params_d):
        # "real" backward: fake detached inside the mean
        real_pred, s1 = model.apply_d(params_d, state.stats_d, gt, True, True)
        fake_detached, _ = model.apply_d(jax.lax.stop_gradient(params_d), s1, sr, True, True)
        l_real = model.cri_gan(real_pred - jnp.mean(jax.lax.stop_gradient(fake_detached)),
                               True, is_disc=True) * 0.5
        # "fake" backward: real detached inside the mean
        fake_pred, _ = model.apply_d(params_d, s1, sr, True, True)
        l_fake = model.cri_gan(fake_pred - jnp.mean(jax.lax.stop_gradient(real_pred)),
                               False, is_disc=True) * 0.5
        return l_real + l_fake

    g1 = jax.grad(combined)(state.params_d)
    g2 = jax.grad(split)(state.params_d)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)
