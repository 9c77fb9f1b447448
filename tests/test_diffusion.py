"""Diffusion tree tests: schedules, VAE, UNet, full SSL train step, samplers."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssl_tpu.diffusion import (
    AutoencoderKL, DiffusionSSLConfig, StableSRSSL, UNetModelDualcondV2,
    EncoderUNetModelWT, build_schedule_arrays, make_beta_schedule, space_timesteps,
)
from ssl_tpu.diffusion.schedules import predict_start_from_noise, q_sample
from ssl_tpu.diffusion.color_fix import adain_color_fix, wavelet_color_fix

pytestmark = pytest.mark.slow


def test_beta_schedules_monotone():
    for s in ("linear", "cosine", "sqrt_linear", "sqrt"):
        betas = make_beta_schedule(s, 100)
        assert betas.shape == (100,)
        assert (betas > 0).all() and (betas < 1).all()
    sched = build_schedule_arrays(make_beta_schedule("linear", 100))
    ac = np.asarray(sched.alphas_cumprod)
    assert (np.diff(ac) < 0).all()


def test_q_sample_roundtrip():
    sched = build_schedule_arrays(make_beta_schedule("linear", 50))
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.asarray([10, 40])
    xt = q_sample(sched, x0, t, noise)
    x0_rec = predict_start_from_noise(sched, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_space_timesteps():
    steps = space_timesteps(1000, 200)
    assert len(steps) == 200
    assert steps[0] == 0 and steps[-1] <= 999


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(ch=16, ch_mult=(1, 2), num_res_blocks=1, embed_dim=4)
    x = jnp.zeros((1, 16, 16, 3))
    v = vae.init(jax.random.PRNGKey(0), x)
    out, mean, logvar = vae.apply(v, x)
    assert mean.shape == (1, 8, 8, 4)
    assert out.shape == x.shape


def test_vae_decoder_block_remat_exact():
    """remat_decoder_blocks changes only backward scheduling: identical param
    pytree, identical decode output, identical gradients through the decode
    (the memory contract that lets 512² StableSR-SSL training fit one v5e —
    see vae.Decoder docstring / ddpm_ssl.py decode site)."""
    kw = dict(ch=16, ch_mult=(1, 2), num_res_blocks=1, embed_dim=4)
    vae_r = AutoencoderKL(remat_decoder_blocks=True, **kw)
    vae_n = AutoencoderKL(remat_decoder_blocks=False, **kw)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    v = vae_r.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                vae_n.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))))

    def loss(zz, vae):
        return jnp.mean(jnp.abs(vae.apply(v, zz, method=vae.decode)))

    out_r = vae_r.apply(v, z, method=vae_r.decode)
    out_n = vae_n.apply(v, z, method=vae_n.decode)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_n), atol=1e-6)
    g_r = jax.grad(loss)(z, vae_r)
    g_n = jax.grad(loss)(z, vae_n)
    np.testing.assert_allclose(np.asarray(g_r), np.asarray(g_n), atol=1e-6)


def test_vae_decoder_remat_skip_lowres_exact():
    """remat_skip_lowres (un-remat the k lowest-res decoder stages) is a pure
    scheduling knob: identical param pytree, decode output, and gradients for
    every k from 0 (round-4 default) through all-stages-skipped (= no remat
    on any ResnetBlock)."""
    kw = dict(ch=16, ch_mult=(1, 2, 4), num_res_blocks=1, embed_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4))
    x0 = jnp.zeros((1, 16, 16, 3))
    vaes = [AutoencoderKL(remat_skip_lowres=k, **kw) for k in range(4)]
    v = vaes[0].init(jax.random.PRNGKey(0), x0)

    def loss(zz, vae):
        return jnp.mean(jnp.abs(vae.apply(v, zz, method=vae.decode)))

    out0 = vaes[0].apply(v, z, method=vaes[0].decode)
    g0 = jax.grad(loss)(z, vaes[0])
    for vae in vaes[1:]:
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(
                    vae.init(jax.random.PRNGKey(0), x0)))
        np.testing.assert_allclose(
            np.asarray(vae.apply(v, z, method=vae.decode)), np.asarray(out0),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jax.grad(loss)(z, vae)), np.asarray(g0), atol=1e-6)


def test_unet_dualcond_shapes():
    unet = UNetModelDualcondV2(model_channels=32, channel_mult=(1, 2), num_heads=4,
                               context_dim=64, attention_resolutions=(2,))
    enc = EncoderUNetModelWT(model_channels=32, channel_mult=(1, 2))
    z = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 5, 64))
    ev = enc.init(jax.random.PRNGKey(0), z, t)
    feats = enc.apply(ev, z, t)
    assert len(feats) == 2
    uv = unet.init(jax.random.PRNGKey(1), z, t, ctx, feats)
    out = unet.apply(uv, z, t, ctx, feats)
    assert out.shape == z.shape


def test_stablesr_ssl_train_step():
    from ssl_tpu.losses.ssl_loss import SSLSetting
    from ssl_tpu.ops.ssg import SSGConfig
    cfg = DiffusionSSLConfig(timesteps=20, context_dim=32, context_len=4)
    model = StableSRSSL(
        cfg,
        unet=UNetModelDualcondV2(model_channels=32, channel_mult=(1, 2), num_heads=4,
                                 context_dim=32, attention_resolutions=(2,)),
        structcond=EncoderUNetModelWT(model_channels=32, channel_mult=(1, 2)),
        vae=AutoencoderKL(ch=16, ch_mult=(1, 2, 2, 2), num_res_blocks=1, embed_dim=4),
        ssl_setting=SSLSetting(ssg=SSGConfig(search=9, window=5), mask_stride=3,
                               capacity=64, l1_weight=0.5, kl_weight=0.5),
        lr=1e-4)
    state = model.init_state(gt_shape=(1, 32, 32, 3))
    rng = np.random.RandomState(0)
    batch = {
        "gt": jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32),
        "lq": jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32),
        "gt_mask": jnp.asarray(rng.rand(1, 32, 32, 1) < 0.2, jnp.float32),
    }
    state, logs = model.train_step(state, batch)
    for k in ("l_simple", "l_pixel", "l_selfsim", "l_selfsim_kl", "l_total"):
        assert np.isfinite(float(logs[k])), k
    assert int(state.step) == 1

    # ImageLogger-parity preview (main.py image dumps): 4 image stacks in
    # [0,1] at GT resolution, deterministic across calls (fixed key)
    imgs = model.preview(state, batch)
    assert set(imgs) == {"inputs", "gt", "reconstruction", "pred_x0"}
    for k, v in imgs.items():
        v = np.asarray(v)
        assert v.shape == (1, 32, 32, 3), k
        assert np.isfinite(v).all() and v.min() >= 0.0 and v.max() <= 1.0, k
    again = model.preview(state, batch)
    np.testing.assert_array_equal(np.asarray(imgs["pred_x0"]),
                                  np.asarray(again["pred_x0"]))


def test_color_fix():
    rng = np.random.RandomState(0)
    target = rng.rand(32, 32, 3).astype(np.float32)
    source = (rng.rand(32, 32, 3) * 0.5 + 0.25).astype(np.float32)
    out_a = adain_color_fix(target, source)
    np.testing.assert_allclose(out_a.mean(axis=(0, 1)), source.mean(axis=(0, 1)), atol=0.05)
    out_w = wavelet_color_fix(target, source)
    assert out_w.shape == target.shape
    assert np.isfinite(out_w).all()


def test_autoencoder_kl_resi_cfw():
    """CFW fusion decoder consumes LQ-encoder features during decode."""
    from ssl_tpu.diffusion.vae import AutoencoderKLResi
    vae = AutoencoderKLResi(ch=16, ch_mult=(1, 2, 2, 2), num_res_blocks=1, embed_dim=4)
    x = jnp.zeros((1, 32, 32, 3))
    v = vae.init(jax.random.PRNGKey(0), x)
    out, mean, logvar = vae.apply(v, x)
    assert out.shape == x.shape
    assert mean.shape == (1, 4, 4, 4)
    # decode with external latent + the encoder features
    mean2, logvar2, feas = vae.apply(v, x, method=AutoencoderKLResi.encode)
    dec = vae.apply(v, mean2, feas, method=AutoencoderKLResi.decode)
    assert dec.shape == x.shape


def test_cfw_train_step(tmp_path):
    """CFW stage-2 training: decoder/fusion learn, encoder stays frozen."""
    import numpy as np
    from ssl_tpu.diffusion.cfw_train import CFWTrainModel
    opt = {
        "vae": {"embed_dim": 4, "ch": 16, "ch_mult": [1, 2, 2, 2], "num_res_blocks": 1},
        "network_d": {"type": "UNetDiscriminatorSNv1", "num_feat": 4},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-3},
                  "optim_d": {"type": "Adam", "lr": 1e-3},
                  "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                              "loss_weight": 0.05},
                  "scheduler": {"type": "MultiStepLR", "milestones": [1000]}},
    }
    model = CFWTrainModel(opt)
    state = model.init_state(gt_shape=(1, 32, 32, 3))
    frozen_before = jax.tree_util.tree_map(np.asarray, state.extra["frozen"])
    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
             for k in ("gt", "lq", "sr")}
    step = model.make_train_step()
    params_before = jax.tree_util.tree_map(np.asarray, state.params_g)
    for _ in range(2):
        state, logs = step(state, batch)
    assert np.isfinite(float(logs["l_total"])) and np.isfinite(float(logs["l_d"]))
    # frozen encoder identical, trainable decoder moved
    for a, b in zip(jax.tree_util.tree_leaves(frozen_before),
                    jax.tree_util.tree_leaves(state.extra["frozen"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree_util.tree_leaves(params_before),
                                jax.tree_util.tree_leaves(state.params_g)))
    assert moved
    # CFW inference decode path
    out = model.decode(state, batch["sr"], batch["lq"])
    assert out.shape == (1, 32, 32, 3)


def test_cfw_triplet_dataset(tmp_path):
    import numpy as np
    import os
    from PIL import Image
    from ssl_tpu.diffusion.cfw_train import CFWTripletDataset
    rng = np.random.RandomState(0)
    for sub, size in (("gt", 32), ("inputs", 8), ("outputs", 32)):
        os.makedirs(tmp_path / sub)
        for i in range(2):
            arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / sub / f"{i:03d}.png")
    ds = CFWTripletDataset(str(tmp_path / "gt"), str(tmp_path / "inputs"),
                           str(tmp_path / "outputs"), crop_size=16)
    assert len(ds) == 2
    item = ds[0]
    assert item["gt"].shape == (16, 16, 3)
    assert item["lq"].shape == (16, 16, 3)  # upscaled 8->32 then cropped
    assert item["sr"].shape == (16, 16, 3)


def test_ldm_vae_conversion():
    """SD/ldm first_stage_model layout -> our VAE tree, merged into the CFW
    autoencoder (fuse convs keep their zero init)."""
    import numpy as np
    import torch
    from ssl_tpu.diffusion.vae import AutoencoderKLResi
    from ssl_tpu.utils.weight_port import convert_ldm_vae, merge_into_tree
    ch, z = 8, 4
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, co, ci, k=3):
        sd[f"{name}.weight"] = torch.from_numpy(rng.randn(co, ci, k, k).astype(np.float32) * 0.05)
        sd[f"{name}.bias"] = torch.zeros(co)

    def norm(name, c):
        sd[f"{name}.weight"] = torch.ones(c)
        sd[f"{name}.bias"] = torch.zeros(c)

    def resblk(pfx, ci, co):
        norm(f"{pfx}.norm1", ci)
        conv(f"{pfx}.conv1", co, ci)
        norm(f"{pfx}.norm2", co)
        conv(f"{pfx}.conv2", co, co)
        if ci != co:
            conv(f"{pfx}.nin_shortcut", co, ci, k=1)

    def attn(pfx, c):
        norm(f"{pfx}.norm", c)
        for n in ("q", "k", "v", "proj_out"):
            conv(f"{pfx}.{n}", c, c, k=1)

    # encoder: ch_mult (1,2), 1 res block
    conv("encoder.conv_in", ch, 3)
    resblk("encoder.down.0.block.0", ch, ch)
    conv("encoder.down.0.downsample.conv", ch, ch)
    resblk("encoder.down.1.block.0", ch, 2 * ch)
    resblk("encoder.mid.block_1", 2 * ch, 2 * ch)
    attn("encoder.mid.attn_1", 2 * ch)
    resblk("encoder.mid.block_2", 2 * ch, 2 * ch)
    norm("encoder.norm_out", 2 * ch)
    conv("encoder.conv_out", 2 * z, 2 * ch)
    # decoder
    conv("decoder.conv_in", 2 * ch, z)
    resblk("decoder.mid.block_1", 2 * ch, 2 * ch)
    attn("decoder.mid.attn_1", 2 * ch)
    resblk("decoder.mid.block_2", 2 * ch, 2 * ch)
    resblk("decoder.up.1.block.0", 2 * ch, 2 * ch)
    resblk("decoder.up.1.block.1", 2 * ch, 2 * ch)
    conv("decoder.up.1.upsample.conv", 2 * ch, 2 * ch)
    resblk("decoder.up.0.block.0", 2 * ch, ch)
    resblk("decoder.up.0.block.1", ch, ch)
    norm("decoder.norm_out", ch)
    conv("decoder.conv_out", 3, ch)
    conv("quant_conv", 2 * z, 2 * z, k=1)
    conv("post_quant_conv", z, z, k=1)
    # exercise the full-SD-checkpoint prefix path too
    sd = {f"first_stage_model.{k}": v for k, v in sd.items()}

    net = AutoencoderKLResi(embed_dim=z, ch=ch, ch_mult=(1, 2), num_res_blocks=1)
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    converted = convert_ldm_vae(sd)
    merged = merge_into_tree(ref["params"], jax.tree_util.tree_map(jnp.asarray, converted))
    np.testing.assert_array_equal(
        np.asarray(merged["encoder"]["conv_in"]["kernel"]),
        sd["first_stage_model.encoder.conv_in.weight"].numpy().transpose(2, 3, 1, 0))
    out, mean, logvar = net.apply({"params": merged}, jnp.ones((1, 16, 16, 3)) * 0.4)
    assert out.shape == (1, 16, 16, 3) and np.isfinite(np.asarray(out)).all()


def test_stablesr_vae_ckpt_loading(tmp_path):
    """StableSRSSL init_state loads the frozen first stage from an SD-layout
    checkpoint via convert_ldm_vae (here: exported from a fresh tiny VAE)."""
    import numpy as np
    import torch
    from ssl_tpu.diffusion import AutoencoderKL, DiffusionSSLConfig, StableSRSSL
    from ssl_tpu.diffusion import EncoderUNetModelWT, UNetModelDualcondV2
    vae = AutoencoderKL(embed_dim=4, ch=8, ch_mult=(1, 2, 2, 2), num_res_blocks=1)
    # build a torch-layout sd by inverting our own tree (kernel -> OIHW etc.)
    ref = vae.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)))["params"]

    def to_sd(tree, pfx, sd):
        for k, v in tree.items():
            name = f"{pfx}.{k}" if pfx else k
            if isinstance(v, dict):
                # invert our naming back to ldm naming
                name = (name.replace("mid_attn", "mid.attn_1")
                        .replace("mid_block_", "mid.block_")
                        .replace("norm_out", "norm_out"))
                import re as _re
                name = _re.sub(r"(down|up)_(\d+)_block_(\d+)", r"\1.\2.block.\3", name)
                name = _re.sub(r"(down|up)_(\d+)_(downsample|upsample)", r"\1.\2.\3.conv", name)
                to_sd(v, name, sd)
            else:
                arr = np.asarray(v)
                leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias"}
                base, leaf = name.rsplit(".", 1)
                # our auto-named ResnetBlock internals -> ldm norms/convs
                base = (base.replace("GroupNorm_0", "norm1").replace("GroupNorm_1", "norm2")
                        .replace("Conv_0", "conv1").replace("Conv_1", "conv2")
                        .replace("Conv_2", "nin_shortcut"))
                if base.endswith("mid.attn_1.norm1"):
                    base = base[:-len("norm1")] + "norm"
                if leaf == "kernel":
                    arr = arr.transpose(3, 2, 0, 1)
                sd[f"{base}.{leaf_map[leaf]}"] = torch.from_numpy(np.ascontiguousarray(arr))

    sd = {}
    to_sd(ref, "", sd)
    path = str(tmp_path / "sd_vae.ckpt")
    torch.save({"state_dict": sd}, path)

    model = StableSRSSL(
        DiffusionSSLConfig(context_dim=32),
        unet=UNetModelDualcondV2(model_channels=32, num_res_blocks=1,
                                 channel_mult=(1, 2), attention_resolutions=(2,),
                                 num_heads=4, context_dim=32),
        structcond=EncoderUNetModelWT(model_channels=32, channel_mult=(1, 2)),
        vae=vae, vae_ckpt=path)
    state = model.init_state(gt_shape=(1, 32, 32, 3))
    got = np.asarray(state.frozen["vae"]["encoder"]["conv_in"]["kernel"])
    np.testing.assert_allclose(got, np.asarray(ref["encoder"]["conv_in"]["kernel"]))


def test_diffusion_ema_tracks_params():
    """LitEma equivalent (reference ddpm.py use_ema): ema_params exist, move
    toward params with the ramped decay, and drive infer_params."""
    import jax
    from ssl_tpu.diffusion import (DiffusionSSLConfig, StableSRSSL,
                                   UNetModelDualcondV2, EncoderUNetModelWT)
    from ssl_tpu.diffusion.vae import AutoencoderKL
    model = StableSRSSL(
        DiffusionSSLConfig(timesteps=10, context_dim=32, context_len=4),
        unet=UNetModelDualcondV2(model_channels=32, num_res_blocks=1,
                                 channel_mult=(1, 2), attention_resolutions=(2,),
                                 num_heads=4, num_head_channels=-1, context_dim=32,
                                 semb_channels=32),
        structcond=EncoderUNetModelWT(model_channels=32, channel_mult=(1, 2),
                                      out_channels=32, num_res_blocks=1),
        vae=AutoencoderKL(ch=16, ch_mult=(1, 2, 2, 2), num_res_blocks=1, embed_dim=4),
        use_ema=True)
    state = model.init_state(gt_shape=(1, 32, 32, 3))
    assert state.ema_params is not None
    rng = np.random.RandomState(0)
    batch = {"gt": jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32),
             "lq": jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32),
             "gt_mask": jnp.asarray(rng.rand(1, 32, 32, 1) < 0.2, jnp.float32)}
    # snapshot BEFORE the step: train_step donates the input state
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    new_state, logs = model.train_step(state, batch)
    e1 = jax.tree_util.tree_leaves(new_state.ema_params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.params)[0]
    # step 0: decay = min(0.9999, 1/10) = 0.1 -> ema ≈ 0.1*old + 0.9*new
    np.testing.assert_allclose(np.asarray(e1),
                               0.1 * np.asarray(p0) + 0.9 * np.asarray(p1),
                               rtol=1e-5, atol=1e-7)
    assert model.infer_params(new_state) is new_state.ema_params


def test_diffusion_bf16_deviation():
    """bf16 ``compute_dtype`` on the diffusion UNet / struct-cond / VAE: the
    documented precision contract (unet.py/vae.py docstrings) — identical
    fp32 param tree, fp32 outputs within ~bf16 rounding of the fp32-compute
    path, gradient direction preserved.  Same contract family as
    test_d_bf16_deviation / test_g_bf16_deviation on the GAN side; the
    diffusion step is memory-bound (BASELINE.md MFU table) so activation
    width is the perf lever."""
    def mk(dt):
        unet = UNetModelDualcondV2(model_channels=32, num_res_blocks=1,
                                   channel_mult=(1, 2), attention_resolutions=(2,),
                                   num_heads=4, num_head_channels=-1,
                                   context_dim=32, semb_channels=32,
                                   compute_dtype=dt)
        struct = EncoderUNetModelWT(model_channels=32, channel_mult=(1, 2),
                                    out_channels=32, num_res_blocks=1,
                                    compute_dtype=dt)
        vae = AutoencoderKL(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                            embed_dim=4, compute_dtype=dt)
        return unet, struct, vae

    u32, s32, v32 = mk(None)
    u16, s16, v16 = mk("bfloat16")
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (2, 16, 16, 4))
    t = jnp.asarray([3, 7])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32))
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))

    sv = s32.init(jax.random.PRNGKey(3), z, t)
    feats32 = s32.apply(sv, z, t)
    feats16 = s16.apply(sv, z, t)
    uv = u32.init(jax.random.PRNGKey(4), z, t, ctx, feats32)
    vv = v32.init(jax.random.PRNGKey(5), img)
    # identical fp32 trees under bf16 compute
    for m16, m32, args in ((s16, s32, (z, t)), ):
        assert (jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                       m16.init(jax.random.PRNGKey(3), *args))
                == jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), sv))
    assert all(str(a.dtype) == "float32"
               for a in jax.tree_util.tree_leaves((sv, uv, vv)))

    # struct encoder: fp32 dict outputs, bf16-rounding-close
    for k in feats32:
        assert feats16[k].dtype == jnp.float32
        scale = float(jnp.abs(feats32[k]).max()) + 1e-12
        assert float(jnp.abs(feats32[k] - feats16[k]).max()) / scale < 3e-2

    o32 = u32.apply(uv, z, t, ctx, feats32)
    o16 = u16.apply(uv, z, t, ctx, feats32)
    assert o16.dtype == jnp.float32
    scale = float(jnp.abs(o32).max()) + 1e-12
    assert float(jnp.abs(o32 - o16).max()) / scale < 3e-2

    d32, m32m, lv32 = v32.apply(vv, img, sample_posterior=False)
    d16, m16m, lv16 = v16.apply(vv, img, sample_posterior=False)
    assert d16.dtype == jnp.float32 and m16m.dtype == jnp.float32
    for a, b_ in ((d32, d16), (m32m, m16m), (lv32, lv16)):
        scale = float(jnp.abs(a).max()) + 1e-12
        assert float(jnp.abs(a - b_).max()) / scale < 3e-2

    # gradient direction through the UNet (the trained component).  The
    # zero-init output/proj convs block gradient flow at exact init (all
    # grads zero) — perturb params off the zero-init manifold first.
    leaves, treedef = jax.tree_util.tree_flatten(uv["params"])
    keys = jax.random.split(jax.random.PRNGKey(6), len(leaves))
    up = jax.tree_util.tree_unflatten(
        treedef, [a + 0.02 * jax.random.normal(k, a.shape)
                  for a, k in zip(leaves, keys)])

    def loss(params, net):
        out = net.apply({"params": params}, z, t, ctx, feats32)
        return jnp.mean((out - 1.0) ** 2)

    g32 = jax.grad(loss)(up, u32)
    g16 = jax.grad(loss)(up, u16)
    f32 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g32)])
    f16 = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g16)])
    cos = jnp.vdot(f32, f16) / (jnp.linalg.norm(f32) * jnp.linalg.norm(f16) + 1e-12)
    assert float(cos) > 0.98, float(cos)


def test_diffusion_bf16_config_plumbing():
    """model.compute_dtype fans out to UNet/struct-cond/VAE in the CLI
    builder, and a reference-schema model.params.compute_dtype override maps
    through translate_reference_config."""
    from ssl_tpu.diffusion.main import build_from_config
    cfg = {
        "model": {"compute_dtype": "bfloat16", "context_dim": 32,
                  "unet": {"model_channels": 32, "num_res_blocks": 1,
                           "channel_mult": (1, 2), "attention_resolutions": (2,),
                           "num_heads": 4, "num_head_channels": -1,
                           "semb_channels": 32},
                  "structcond": {"model_channels": 32, "channel_mult": (1, 2),
                                 "out_channels": 32, "num_res_blocks": 1},
                  "first_stage": {"ch": 16, "ch_mult": (1, 2),
                                  "num_res_blocks": 1, "embed_dim": 4}},
        "sslopt": {}, "train": {},
    }
    model = build_from_config(cfg)
    assert model.unet.compute_dtype == "bfloat16"
    assert model.structcond.compute_dtype == "bfloat16"
    assert model.vae.compute_dtype == "bfloat16"

    from ssl_tpu.diffusion.ref_config import translate_reference_config
    ref = {"model": {"target": "ldm.models.diffusion.ddpmssl.LatentDiffusionSRTextWTSSL",
                     "params": {"compute_dtype": "bfloat16",
                                "unet_config": {"params": {"model_channels": 32}},
                                "first_stage_config": {"params": {}},
                                "structcond_stage_config": {"params": {}}}}}
    out = translate_reference_config(ref)
    assert out["model"]["compute_dtype"] == "bfloat16"
