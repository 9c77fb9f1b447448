"""Extended arch tests (BSRGAN/BebyGAN/RankSRGAN/ELAN/SPSR/SwinIR) + SSL recipes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl_tpu.archs import build_network
from ssl_tpu.models import build_model

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("cfg,shape,want", [
    (dict(type="BSRGANRRDBNet", nf=8, nb=1, gc=4, sf=2), (1, 8, 8, 3), (1, 16, 16, 3)),
    (dict(type="RRDBBebyGANNet", nf=8, nb=1, gc=4), (1, 8, 8, 3), (1, 32, 32, 3)),
    (dict(type="RankSRGANSRResNet", nf=8, nb=2, upscale=4), (1, 8, 8, 3), (1, 32, 32, 3)),
    (dict(type="ELAN", scale=4, m_elan=2, c_elan=30, window_sizes=(4, 8, 16)), (1, 10, 14, 3), (1, 40, 56, 3)),
    (dict(type="SwinIR", upscale=4, embed_dim=12, depths=(2,), num_heads=(2,),
          window_size=8, num_feat=8), (1, 10, 10, 3), (1, 40, 40, 3)),
])
def test_arch_shapes(cfg, shape, want):
    net = build_network(cfg)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros(shape))
    out = net.apply(v, jnp.zeros(shape))
    assert out.shape == want


def test_spsr_dual_output():
    net = build_network(dict(type="SPSRNet", nf=8, nb=23, gc=4, upscale=4))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    branch, sr, grad = net.apply(v, jnp.zeros((1, 8, 8, 3)))
    assert branch.shape == (1, 32, 32, 3)
    assert sr.shape == (1, 32, 32, 3)
    assert grad.shape == (1, 8, 8, 3)


def _base_ssl_opt(model_type, g_cfg):
    return {
        "name": "t", "model_type": model_type, "scale": 4, "is_train": True,
        "manual_seed": 0, "datasets": {"train": {"gt_size": 32}},
        "network_g": g_cfg,
        "network_d": {"type": "UNetDiscriminatorSN", "num_feat": 4},
        "path": {},
        "ssl_setting": {"kernel_size_search": 9, "kernel_size_window": 5,
                        "sigma": 0.004, "generalization": True, "capacity": 32},
        "train": {
            "ema_decay": 0.999,
            "optim_g": {"type": "Adam", "lr": 1e-4}, "optim_d": {"type": "Adam", "lr": 1e-4},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1e-2},
            "selfsim_opt": {"type": "L1Loss", "loss_weight": 1e3},
            "selfsim1_opt": {"type": "KLDistanceLoss", "loss_weight": 1e3},
            "gan_opt": {"type": "GANLoss", "gan_type": "vanilla", "loss_weight": 5e-3},
        },
    }


def _batch(b=1, lq=8, scale=4):
    rng = np.random.RandomState(0)
    return {"lq": jnp.asarray(rng.rand(b, lq, lq, 3), jnp.float32),
            "gt": jnp.asarray(rng.rand(b, lq * scale, lq * scale, 3), jnp.float32),
            "gt_mask": jnp.asarray(rng.rand(b, lq * scale, lq * scale, 1) < 0.2, jnp.float32)}


def test_bebygan_ssl_step():
    opt = _base_ssl_opt("BebyGANSSLModel", dict(type="RRDBBebyGANNet", nf=8, nb=1, gc=4))
    opt["train"]["bbl_opt"] = {"loss_weight": 1.0}
    opt["train"]["back_projection_opt"] = {"loss_weight": 1.0}
    model = build_model(opt)
    state = model.init_state(lq_shape=(1, 8, 8, 3))
    state, logs = model.train_step(state, _batch())
    for k in ("l_g_bbl", "l_g_bp", "l_selfsim"):
        assert np.isfinite(float(logs[k])), k


def test_spsr_ssl_step():
    opt = _base_ssl_opt("SPSRSSLModel", dict(type="SPSRNet", nf=8, nb=23, gc=4, upscale=4))
    opt["network_d_grad"] = {"type": "UNetDiscriminatorSN", "num_feat": 4}
    model = build_model(opt)
    state = model.init_state(lq_shape=(1, 8, 8, 3))
    state, logs = model.train_step(state, _batch())
    for k in ("l_g_grad_pix", "l_g_gan_grad", "l_d_real_grad", "l_selfsim"):
        assert np.isfinite(float(logs[k])), k


def test_ldl_ssl_step():
    opt = _base_ssl_opt("LDLSSLModel", dict(type="MSRResNet", num_feat=8, num_block=1, upscale=4))
    opt["train"]["artifacts_opt"] = {"type": "L1Loss", "loss_weight": 1.0}
    model = build_model(opt)
    state = model.init_state(lq_shape=(1, 8, 8, 3))
    state, logs = model.train_step(state, _batch())
    assert np.isfinite(float(logs["l_g_artifacts"]))


def test_ranksrgan_ssl_step():
    opt = _base_ssl_opt("RankSRGANSSLModel",
                        dict(type="RankSRGANSRResNet", nf=8, nb=1, upscale=4))
    opt["network_r"] = {"type": "Ranker_VGG12_296", "nf": 4}
    opt["train"]["rank_opt"] = {"loss_weight": 0.03, "R_bias": 0.0}
    model = build_model(opt)
    state = model.init_state(lq_shape=(1, 8, 8, 3))
    state, logs = model.train_step(state, _batch())
    assert np.isfinite(float(logs["l_g_rank"]))


def test_stylegan2_generator():
    net = build_network(dict(type="StyleGAN2Generator", out_size=16,
                             num_style_feat=32, num_mlp=2))
    z = jnp.ones((2, 32))
    v = net.init(jax.random.PRNGKey(0), [z])
    out, _ = net.apply(v, [z])
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # discriminator closes the loop
    d = build_network(dict(type="StyleGAN2Discriminator", out_size=16))
    vd = d.init(jax.random.PRNGKey(1), out)
    assert d.apply(vd, out).shape == (2, 1)


def test_mod_and_snv1_discriminators():
    net = build_network(dict(type="UNetDiscriminatorSNv1", num_feat=4))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 25, 25, 3)))
    out, _ = net.apply(v, jnp.zeros((1, 25, 25, 3)), mutable=["batch_stats"])
    assert out.shape == (1, 25, 25, 1)
    net = build_network(dict(type="MOD", num_feat=8, num_expert=4))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    (logits, routing, parts, ortho_w), _ = net.apply(
        v, jnp.zeros((1, 32, 32, 3)), mutable=["batch_stats"])
    assert logits.shape == (1, 64, 1)
    assert routing.shape == (1, 64, 4)
    assert ortho_w.shape[0] == 4


@pytest.mark.parametrize("cfg", [
    dict(type="EDSR", num_feat=8, num_block=2, upscale=4),
    dict(type="RCAN", num_feat=8, num_group=1, num_block=2, squeeze_factor=4, upscale=4),
    dict(type="ECBSR", num_channel=8, num_block=2, scale=4),
])
def test_classic_sr_archs(cfg):
    net = build_network(cfg)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    out = net.apply(v, jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_basicvsr_and_spynet():
    net = build_network(dict(type="BasicVSR", num_feat=8, num_block=1))
    lqs = jnp.zeros((1, 3, 40, 40, 3))
    v = net.init(jax.random.PRNGKey(0), lqs)
    out = net.apply(v, lqs)
    assert out.shape == (1, 3, 160, 160, 3)


def test_edvr():
    net = build_network(dict(type="EDVR", num_feat=8, num_frame=3, num_extract_block=1,
                             num_reconstruct_block=1, deform_groups=2))
    lqs = jnp.zeros((1, 3, 8, 8, 3))
    v = net.init(jax.random.PRNGKey(0), lqs)
    out = net.apply(v, lqs)
    assert out.shape == (1, 32, 32, 3)


def test_tof_and_duf():
    lqs = jnp.zeros((1, 7, 16, 16, 3))
    net = build_network(dict(type="TOFlow"))
    v = net.init(jax.random.PRNGKey(0), lqs)
    assert net.apply(v, lqs).shape == (1, 16, 16, 3)
    net = build_network(dict(type="DUF", scale=4, num_layer=16))
    v = net.init(jax.random.PRNGKey(0), lqs)
    assert net.apply(v, lqs).shape == (1, 64, 64, 3)


def test_ridnet():
    net = build_network(dict(type="RIDNet", num_feat=16, num_block=1))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    assert net.apply(v, jnp.zeros((1, 16, 16, 3))).shape == (1, 16, 16, 3)


def test_hifacegan_and_deresnet():
    net = build_network(dict(type="HiFaceGAN", num_feat=4))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = net.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 3)
    d = build_network(dict(type="HiFaceGANDiscriminator", num_feat=4, num_d=2))
    vd = d.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 6)))
    res = d.apply(vd, jnp.zeros((1, 64, 64, 6)))
    assert len(res) == 2 and res[0][-1].shape[-1] == 1
    net = build_network(dict(type="DEResNet", num_feats=(8, 16), num_blocks=(1, 1),
                             downscales=(2, 1)))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    assert net.apply(v, jnp.zeros((2, 32, 32, 3))).shape == (2, 2)


def test_nlayer_discriminator():
    from ssl_tpu.archs import build_network
    net = build_network(dict(type="NLayerDiscriminator", ndf=8, n_layers=3))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out, _ = net.apply(v, jnp.ones((1, 64, 64, 3)) * 0.5, True,
                       mutable=["batch_stats"])
    assert out.shape[0] == 1 and out.shape[-1] == 1
    assert np.isfinite(np.asarray(out)).all()


def test_spsr_branch_pretrain_and_net_d_gating():
    """SPSR fidelity gates (reference spsrssl_model.py:284-291, :387):
    during Branch_init_iters only 'f_*' params move; with net_d_init_iters
    G does not update at all on early iters while D does."""
    import jax
    opt = _base_ssl_opt("SPSRSSLModel", dict(type="SPSRNet", nf=8, nb=23, gc=4, upscale=4))
    opt["network_d_grad"] = {"type": "UNetDiscriminatorSN", "num_feat": 4}
    opt["train"].update({"Branch_pretrain": 1, "Branch_init_iters": 2,
                         "gradient_pixel_opt": {"type": "L1Loss", "loss_weight": 1.0}})
    from ssl_tpu.models import build_model
    model = build_model(opt)
    state = model.init_state(lq_shape=(1, 8, 8, 3))
    batch = _batch()

    def leaves_by_branch(tree):
        import jax.tree_util as jtu
        flat = jtu.tree_flatten_with_path(tree)[0]
        fb = [np.asarray(v) for k, v in flat if str(k[0].key).startswith("f_")]
        other = [np.asarray(v) for k, v in flat if not str(k[0].key).startswith("f_")]
        return fb, other

    # snapshot to host BEFORE the step: train_step donates the input state
    f_old, o_old = leaves_by_branch(state.params_g)
    new_state, logs = model.train_step(state, batch)
    f_new, o_new = leaves_by_branch(new_state.params_g)
    assert any(not np.allclose(a, b) for a, b in zip(f_old, f_new)), \
        "fusion branch should train during pretrain"
    assert all(np.allclose(a, b) for a, b in zip(o_old, o_new)), \
        "non-branch params must stay frozen during Branch_init_iters"

    # net_d_init_iters: G fully frozen on iter 1, D still trains
    opt2 = _base_ssl_opt("SPSRSSLModel", dict(type="SPSRNet", nf=8, nb=23, gc=4, upscale=4))
    opt2["network_d_grad"] = {"type": "UNetDiscriminatorSN", "num_feat": 4}
    opt2["train"].update({"net_d_init_iters": 3,
                          "gradient_pixel_opt": {"type": "L1Loss", "loss_weight": 1.0}})
    model2 = build_model(opt2)
    s0 = model2.init_state(lq_shape=(1, 8, 8, 3))
    g0 = [np.asarray(v) for v in jax.tree_util.tree_leaves(s0.params_g)]
    d0 = [np.asarray(v) for v in jax.tree_util.tree_leaves(s0.params_d)]
    s1, _ = model2.train_step(s0, batch)
    g1 = jax.tree_util.tree_leaves(s1.params_g)
    assert all(np.allclose(a, b) for a, b in zip(g0, g1)), "G gated off"
    d1 = jax.tree_util.tree_leaves(s1.params_d)
    assert any(not np.allclose(a, b) for a, b in zip(d0, d1)), "D must train"


def test_bebygan_plain_model_step():
    """Reference bebygan_model.py (SSL-less original): same recipe with
    use_ssl off when no ssl_setting is configured."""
    opt = _base_ssl_opt("BebyGANModel", dict(type="RRDBBebyGANNet", nf=8, nb=1, gc=4))
    del opt["ssl_setting"]
    opt["train"].pop("selfsim_opt")
    opt["train"].pop("selfsim1_opt")
    opt["train"]["bbl_opt"] = {"loss_weight": 1.0}
    model = build_model(opt)
    assert not model.use_ssl
    state = model.init_state(lq_shape=(1, 8, 8, 3))
    state, logs = model.train_step(state, _batch())
    assert np.isfinite(float(logs["l_g_bbl"]))
    assert "l_selfsim" not in logs
