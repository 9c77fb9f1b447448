"""Weight porting: reference RRDBNet .pth layout -> scanned flax tree."""
import os
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ssl_tpu.archs import build_network
from ssl_tpu.utils.weight_port import convert_rrdbnet, load_params_auto

pytestmark = pytest.mark.slow


def _synthetic_rrdb_state_dict(nf=8, gc=4, nb=2, rng=None):
    rng = rng or np.random.RandomState(0)
    sd = {}

    def conv(cin, cout, k=3):
        return (torch.from_numpy(rng.randn(cout, cin, k, k).astype(np.float32) * 0.05),
                torch.from_numpy(rng.randn(cout).astype(np.float32) * 0.01))

    for name, (cin, cout) in {
        "conv_first": (3, nf), "conv_body": (nf, nf), "conv_up1": (nf, nf),
        "conv_up2": (nf, nf), "conv_hr": (nf, nf), "conv_last": (nf, 3),
    }.items():
        w, b = conv(cin, cout)
        sd[f"{name}.weight"], sd[f"{name}.bias"] = w, b
    for i in range(nb):
        for j in (1, 2, 3):
            cin = nf
            for k in (1, 2, 3, 4, 5):
                cout = gc if k < 5 else nf
                w, b = conv(cin, cout)
                sd[f"body.{i}.rdb{j}.conv{k}.weight"] = w
                sd[f"body.{i}.rdb{j}.conv{k}.bias"] = b
                cin += gc if k < 5 else 0
                if k == 4:
                    cin = nf + 4 * gc
    return sd


def test_rrdbnet_conversion_runs_forward(tmp_path):
    nf, gc, nb = 8, 4, 2
    sd = _synthetic_rrdb_state_dict(nf, gc, nb)
    path = str(tmp_path / "net_g.pth")
    torch.save({"params": sd}, path)

    net = build_network(dict(type="RRDBNet", num_feat=nf, num_grow_ch=gc, num_block=nb))
    ref_vars = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    loaded = load_params_auto(path, "params", ref_vars["params"])
    assert loaded is not None
    # stacked block leaves have the (nb, ...) leading axis
    leaf = jax.tree_util.tree_leaves(loaded["body"])[0]
    assert leaf.shape[0] == nb
    out = net.apply({"params": loaded}, jnp.ones((1, 8, 8, 3)) * 0.5)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_export_roundtrip_exact(tmp_path):
    """flax -> reference .pth -> flax must be bit-exact."""
    from ssl_tpu.utils.weight_port import export_rrdbnet_to_torch
    net = build_network(dict(type="RRDBNet", num_feat=8, num_block=2, num_grow_ch=4))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    path = str(tmp_path / "export.pth")
    export_rrdbnet_to_torch(v["params"], path, also_ema=v["params"])
    loaded = load_params_auto(path, "params", v["params"])
    a = jax.tree_util.tree_leaves(v["params"])
    b = jax.tree_util.tree_leaves(loaded)
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


def test_conversion_kernel_transpose_math():
    """A single conv layer ported from torch must produce identical outputs."""
    rng = np.random.RandomState(0)
    w = rng.randn(6, 3, 3, 3).astype(np.float32)  # OIHW
    x = rng.randn(1, 5, 5, 3).astype(np.float32)
    # torch result (NCHW)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tout = torch.nn.functional.conv2d(tx, torch.from_numpy(w), padding=1)
    tout = tout.numpy().transpose(0, 2, 3, 1)
    # jax with HWIO-converted kernel
    jout = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(jout), tout, rtol=1e-4, atol=1e-5)


def test_vgg19_torchvision_layout_conversion(tmp_path):
    """Synthetic torchvision-layout vgg19 state dict -> our extractor; conv
    outputs must match a torch conv reference on the first tap."""
    from ssl_tpu.archs.vgg_arch import VGGFeatureExtractor, load_vgg_weights_from_torch
    rng = np.random.RandomState(0)
    # features indices for vgg19 convs: 0,2,5,7,10,...
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    sd = {}
    idx = 0
    cin = 3
    for v in cfg:
        if v == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            rng.randn(v, cin, 3, 3).astype(np.float32) * 0.05)
        sd[f"features.{idx}.bias"] = torch.from_numpy(rng.randn(v).astype(np.float32) * 0.01)
        cin = v
        idx += 2
    path = str(tmp_path / "vgg19.pth")
    torch.save(sd, path)
    loaded = load_vgg_weights_from_torch(path)
    assert "conv1_1" in loaded["params"] and "conv5_4" in loaded["params"]
    model = VGGFeatureExtractor(layer_name_list=("conv1_1",), use_input_norm=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    params = dict(variables["params"])
    params["conv1_1"] = jax.tree_util.tree_map(jnp.asarray, loaded["params"]["conv1_1"])
    x = rng.rand(1, 8, 8, 3).astype(np.float32)
    out = model.apply({"params": params}, jnp.asarray(x))["conv1_1"]
    tref = torch.nn.functional.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                      sd["features.0.weight"], sd["features.0.bias"],
                                      padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), tref, rtol=1e-4, atol=1e-5)


def test_swinir_export_import_roundtrip(tmp_path):
    """flax SwinIR -> reference .pth layout -> flax must be bit-exact, and the
    reloaded params must drive the forward pass."""
    from ssl_tpu.utils.weight_port import export_swinir_to_torch
    net = build_network(dict(type="SwinIR", upscale=4, embed_dim=8, depths=[4, 4],
                             num_heads=[2, 2], window_size=4, img_size=8,
                             upsampler="pixelshuffle", num_feat=8))
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    path = str(tmp_path / "swinir.pth")
    export_swinir_to_torch(v["params"], path)
    # exported layout must look like a reference checkpoint
    sd = torch.load(path, map_location="cpu", weights_only=False)["params"]
    assert "layers.0.residual_group.blocks.3.attn.qkv.weight" in sd
    assert "patch_embed.norm.weight" in sd and "upsample.2.weight" in sd
    loaded = load_params_auto(path, "params", v["params"])
    assert loaded is not None
    a = jax.tree_util.tree_leaves_with_path(v["params"])
    b = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(a) == len(b)
    for (pa, la), (pb, lb) in zip(a, b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    out = net.apply({"params": loaded}, jnp.ones((1, 8, 8, 3)) * 0.3)
    assert out.shape == (1, 32, 32, 3) and np.isfinite(np.asarray(out)).all()


def test_unet_disc_sn_conversion(tmp_path):
    """Synthetic RealESRGAN-layout UNetDiscriminatorSN .pth -> flax tree +
    power-iteration sigma matching the true largest singular value."""
    from ssl_tpu.utils.weight_port import convert_unet_disc_sn, sn_batch_stats_from_torch
    nf = 4
    rng = np.random.RandomState(0)
    sd = {}
    shapes = {0: (nf, 3, 3, 3), 1: (nf * 2, nf, 4, 4), 2: (nf * 4, nf * 2, 4, 4),
              3: (nf * 8, nf * 4, 4, 4), 4: (nf * 4, nf * 8, 3, 3),
              5: (nf * 2, nf * 4, 3, 3), 6: (nf, nf * 2, 3, 3),
              7: (nf, nf, 3, 3), 8: (nf, nf, 3, 3), 9: (1, nf, 3, 3)}
    for n, shp in shapes.items():
        w = torch.from_numpy(rng.randn(*shp).astype(np.float32) * 0.1)
        if n in (0, 9):
            sd[f"conv{n}.weight"] = w
            sd[f"conv{n}.bias"] = torch.zeros(shp[0])
        else:
            sd[f"conv{n}.weight_orig"] = w
            sd[f"conv{n}.weight_u"] = torch.from_numpy(rng.randn(shp[0]).astype(np.float32))
            sd[f"conv{n}.weight_v"] = torch.from_numpy(
                rng.randn(int(np.prod(shp[1:]))).astype(np.float32))
    path = str(tmp_path / "net_d.pth")
    torch.save({"params": sd}, path)

    net = build_network(dict(type="UNetDiscriminatorSN", num_feat=nf))
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    loaded = load_params_auto(path, "params", ref["params"])
    assert loaded is not None
    from ssl_tpu.utils.weight_port import load_torch_state_dict
    bs = sn_batch_stats_from_torch(load_torch_state_dict(path), ref["batch_stats"])
    # sigma must match the true top singular value of the flattened kernel
    w1 = sd["conv1.weight_orig"].numpy().reshape(nf * 2, -1)
    true_sigma = np.linalg.svd(w1, compute_uv=False)[0]
    got = [v for k, v in bs["conv1"]["SpectralNorm_0"].items() if k.endswith("sigma")][0]
    np.testing.assert_allclose(got, true_sigma, rtol=1e-4)
    out = net.apply({"params": loaded, "batch_stats": bs},
                    jnp.ones((1, 32, 32, 3)) * 0.5, train=False)
    assert out.shape == (1, 32, 32, 1) and np.isfinite(np.asarray(out)).all()


def test_vgg_style_disc_conversion(tmp_path):
    """Synthetic VGGStyleDiscriminator .pth -> flax tree; the linear1
    flatten-order fixup (NCHW vs NHWC) is checked numerically."""
    from ssl_tpu.utils.weight_port import (convert_vgg_style_disc,
                                           vgg_disc_batch_stats,
                                           load_torch_state_dict)
    nf = 4
    rng = np.random.RandomState(0)

    def conv(cout, cin, k, bias=False):
        d = {"weight": torch.from_numpy(rng.randn(cout, cin, k, k).astype(np.float32) * 0.1)}
        if bias:
            d["bias"] = torch.zeros(cout)
        return d

    sd = {}
    for k, v in conv(nf, 3, 3, bias=True).items():
        sd[f"conv0_0.{k}"] = v
    plan = [("conv0_1", nf, nf, 4)]
    cin = nf
    for i, mult in enumerate((2, 4, 8, 8), start=1):
        f = nf * mult
        plan += [(f"conv{i}_0", f, cin, 3), (f"conv{i}_1", f, f, 4)]
        cin = f
    for name, cout, ci, k in plan:
        sd[f"{name}.weight"] = conv(cout, ci, k)["weight"]
        bn = name.replace("conv", "bn")
        sd[f"{bn}.weight"] = torch.from_numpy(1 + 0.1 * rng.randn(cout).astype(np.float32))
        sd[f"{bn}.bias"] = torch.from_numpy(0.1 * rng.randn(cout).astype(np.float32))
        sd[f"{bn}.running_mean"] = torch.from_numpy(0.1 * rng.randn(cout).astype(np.float32))
        sd[f"{bn}.running_var"] = torch.from_numpy(1 + 0.1 * rng.rand(cout).astype(np.float32))
    c_last = nf * 8
    sd["linear1.weight"] = torch.from_numpy(rng.randn(100, c_last * 16).astype(np.float32) * 0.01)
    sd["linear1.bias"] = torch.zeros(100)
    sd["linear2.weight"] = torch.from_numpy(rng.randn(1, 100).astype(np.float32) * 0.01)
    sd["linear2.bias"] = torch.zeros(1)
    path = str(tmp_path / "net_d_vgg.pth")
    torch.save({"params": sd}, path)

    net = build_network(dict(type="VGGStyleDiscriminator", num_feat=nf, input_size=128))
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    loaded = load_params_auto(path, "params", ref["params"])
    assert loaded is not None
    bs = vgg_disc_batch_stats(load_torch_state_dict(path), ref["batch_stats"])
    out = net.apply({"params": loaded, "batch_stats": bs},
                    jnp.ones((1, 128, 128, 3)) * 0.5, train=False)
    assert out.shape == (1, 1) and np.isfinite(np.asarray(out)).all()

    # flatten-order fixup: torch linear1 on NCHW-flat == our Dense_0 on NHWC-flat
    feat = rng.randn(1, c_last, 4, 4).astype(np.float32)
    y_torch = (torch.from_numpy(feat.reshape(1, -1)) @ sd["linear1.weight"].T).numpy()
    nhwc_flat = jnp.asarray(feat.transpose(0, 2, 3, 1).reshape(1, -1))
    y_ours = np.asarray(nhwc_flat @ loaded["Dense_0"]["kernel"])
    np.testing.assert_allclose(y_ours, y_torch, rtol=1e-4, atol=1e-5)


def test_model_loads_pretrain_network_d(tmp_path):
    """pretrain_network_d wiring: an SRGAN model built with a torch-layout D
    checkpoint must pick up the converted weights."""
    from ssl_tpu.utils.weight_port import convert_unet_disc_sn  # noqa: F401
    nf = 4
    rng = np.random.RandomState(1)
    sd = {"conv0.weight": torch.from_numpy(rng.randn(nf, 3, 3, 3).astype(np.float32)),
          "conv0.bias": torch.zeros(nf),
          "conv9.weight": torch.from_numpy(rng.randn(1, nf, 3, 3).astype(np.float32)),
          "conv9.bias": torch.zeros(1)}
    chans = [(nf * 2, nf, 4), (nf * 4, nf * 2, 4), (nf * 8, nf * 4, 4),
             (nf * 4, nf * 8, 3), (nf * 2, nf * 4, 3), (nf, nf * 2, 3),
             (nf, nf, 3), (nf, nf, 3)]
    for n, (co, ci, k) in enumerate(chans, start=1):
        sd[f"conv{n}.weight_orig"] = torch.from_numpy(rng.randn(co, ci, k, k).astype(np.float32) * 0.1)
        sd[f"conv{n}.weight_u"] = torch.zeros(co)
        sd[f"conv{n}.weight_v"] = torch.zeros(ci * k * k)
    path = str(tmp_path / "net_d.pth")
    torch.save({"params": sd}, path)

    from ssl_tpu.models import build_model
    opt = {"model_type": "SRGANModel", "scale": 4, "is_train": True, "num_gpu": 1,
           "network_g": {"type": "MSRResNet", "num_feat": 8, "num_block": 2},
           "network_d": {"type": "UNetDiscriminatorSN", "num_feat": nf},
           "path": {"pretrain_network_d": path},
           "train": {"optim_g": {"type": "Adam", "lr": 1e-4},
                     "optim_d": {"type": "Adam", "lr": 1e-4},
                     "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
                     "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                                 "loss_weight": 0.1},
                     "scheduler": {"type": "MultiStepLR", "milestones": [100]}}}
    model = build_model(opt)
    state = model.init_state(lq_shape=(1, 8, 8, 3))
    got = np.asarray(state.params_d["conv1"]["Conv_0"]["kernel"])
    want = sd["conv1.weight_orig"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)


def test_srvgg_conversion(tmp_path):
    """realesr-general layout (body.N alternating conv/PReLU) -> SRVGGNetCompact."""
    nf, n_conv = 8, 3
    rng = np.random.RandomState(2)
    sd = {}
    chans = [(nf, 3)] + [(nf, nf)] * n_conv
    for i, (co, ci) in enumerate(chans):
        sd[f"body.{2*i}.weight"] = torch.from_numpy(rng.randn(co, ci, 3, 3).astype(np.float32) * 0.1)
        sd[f"body.{2*i}.bias"] = torch.zeros(co)
        sd[f"body.{2*i+1}.weight"] = torch.from_numpy(0.25 + 0.01 * rng.randn(co).astype(np.float32))
    last = 2 * (n_conv + 1)
    sd[f"body.{last}.weight"] = torch.from_numpy(rng.randn(48, nf, 3, 3).astype(np.float32) * 0.1)
    sd[f"body.{last}.bias"] = torch.zeros(48)
    path = str(tmp_path / "srvgg.pth")
    torch.save({"params": sd}, path)

    net = build_network(dict(type="SRVGGNetCompact", num_feat=nf, num_conv=n_conv, upscale=4))
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    loaded = load_params_auto(path, "params", ref["params"])
    assert loaded is not None
    np.testing.assert_array_equal(np.asarray(loaded["act_first"]["alpha"]),
                                  sd["body.1.weight"].numpy())
    out = net.apply({"params": loaded}, jnp.ones((1, 8, 8, 3)) * 0.5)
    assert out.shape == (1, 32, 32, 3) and np.isfinite(np.asarray(out)).all()


def test_msrresnet_conversion(tmp_path):
    nf, nb = 8, 2
    rng = np.random.RandomState(3)

    def conv(co, ci, k=3):
        return (torch.from_numpy(rng.randn(co, ci, k, k).astype(np.float32) * 0.1),
                torch.zeros(co))

    sd = {}
    for name, (ci, co) in {"conv_first": (3, nf), "upconv1": (nf, nf * 4),
                           "upconv2": (nf, nf * 4), "conv_hr": (nf, nf),
                           "conv_last": (nf, 3)}.items():
        sd[f"{name}.weight"], sd[f"{name}.bias"] = conv(co, ci)
    for i in range(nb):
        for j in (1, 2):
            sd[f"body.{i}.conv{j}.weight"], sd[f"body.{i}.conv{j}.bias"] = conv(nf, nf)
    path = str(tmp_path / "msrresnet.pth")
    torch.save({"params": sd}, path)
    net = build_network(dict(type="MSRResNet", num_feat=nf, num_block=nb, upscale=4))
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    loaded = load_params_auto(path, "params", ref["params"])
    assert loaded is not None
    out = net.apply({"params": loaded}, jnp.ones((1, 8, 8, 3)) * 0.5)
    assert out.shape == (1, 32, 32, 3) and np.isfinite(np.asarray(out)).all()


def test_convert_checkpoint_cli(tmp_path):
    """scripts/convert_checkpoint.py import path end-to-end."""
    import pickle
    import subprocess
    import sys as _sys
    sd = _synthetic_rrdb_state_dict()
    src = str(tmp_path / "net_g.pth")
    dst = str(tmp_path / "net_g.pkl")
    torch.save({"params": sd}, src)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([_sys.executable, os.path.join(root, "scripts", "convert_checkpoint.py"),
                        "import", src, dst], capture_output=True, text=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    with open(dst, "rb") as f:
        tree = pickle.load(f)["params"]
    assert "conv_first" in tree and "body" in tree


def test_ranker_conversion(tmp_path):
    """Reference Ranker_VGG12_296 layout -> name-mirrored flax tree + BN stats."""
    from ssl_tpu.utils.weight_port import (load_torch_state_dict, ranker_batch_stats)
    nf = 4
    rng = np.random.RandomState(4)
    sd = {}
    chans = [("conv0_0", nf, 3, 3, False), ("conv0_1", nf, nf, 4, True)]
    cin, mult = nf, 2
    for k in range(1, 5):
        f = nf * min(mult, 8)
        chans += [(f"conv{k}_0", f, cin, 3, True), (f"conv{k}_1", f, f, 4, True)]
        cin, mult = f, mult * 2
    for name, co, ci, k, has_bn in chans:
        sd[f"{name}.weight"] = torch.from_numpy(rng.randn(co, ci, k, k).astype(np.float32) * 0.1)
        sd[f"{name}.bias"] = torch.from_numpy(0.01 * rng.randn(co).astype(np.float32))
        if has_bn:
            bn = name.replace("conv", "bn")
            sd[f"{bn}.weight"] = torch.ones(co)
            sd[f"{bn}.bias"] = torch.zeros(co)
            sd[f"{bn}.running_mean"] = torch.zeros(co)
            sd[f"{bn}.running_var"] = torch.ones(co)
    sd["classifier.0.weight"] = torch.from_numpy(rng.randn(100, nf * 8).astype(np.float32) * 0.01)
    sd["classifier.0.bias"] = torch.zeros(100)
    sd["classifier.2.weight"] = torch.from_numpy(rng.randn(1, 100).astype(np.float32) * 0.01)
    sd["classifier.2.bias"] = torch.zeros(1)
    path = str(tmp_path / "ranker.pth")
    torch.save({"params": sd}, path)

    net = build_network(dict(type="Ranker_VGG12_296", nf=nf))
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    loaded = load_params_auto(path, "params", ref["params"])
    assert loaded is not None
    bs = ranker_batch_stats(load_torch_state_dict(path), ref["batch_stats"])
    out = net.apply({"params": loaded, "batch_stats": bs},
                    jnp.ones((1, 64, 64, 3)) * 0.5, False)
    assert out.shape == (1, 1) and np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(loaded["linear1"]["kernel"]),
                                  sd["classifier.0.weight"].numpy().T)


def test_spsr_conversion(tmp_path):
    """Old-style SPSRNet layout (flattened sequential; model.1.sub RRDBs,
    b_module gradient branch) -> our dual-branch tree."""
    # gc is 32 like every reference SPSR RRDB (the ctor arg is dead upstream)
    nf, gc, nb = 8, 32, 23
    rng = np.random.RandomState(5)

    def conv(co, ci, k=3):
        return (torch.from_numpy(rng.randn(co, ci, k, k).astype(np.float32) * 0.05),
                torch.from_numpy(0.01 * rng.randn(co).astype(np.float32)))

    def put_conv(sd, base, co, ci, k=3, seq=False):
        key = f"{base}.0" if seq else base
        sd[f"{key}.weight"], sd[f"{key}.bias"] = conv(co, ci, k)

    def put_rrdb(sd, pfx, f):
        for j in (1, 2, 3):
            cin = f
            for k in (1, 2, 3, 4, 5):
                cout = gc if k < 5 else f
                # conv1-4 have act (Sequential .0), conv5 flattens bare
                put_conv(sd, f"{pfx}.RDB{j}.conv{k}", cout, cin, seq=(k < 5))
                cin = cin + gc if k < 5 else cin

    sd = {}
    put_conv(sd, "model.0", nf, 3)
    for i in range(nb):
        put_rrdb(sd, f"model.1.sub.{i}", nf)
    put_conv(sd, f"model.1.sub.{nb}", nf, nf)
    put_conv(sd, "model.3", nf, nf)   # upconv1 (model.2 = paramless Upsample)
    put_conv(sd, "model.6", nf, nf)   # upconv2
    put_conv(sd, "model.8", nf, nf)   # HR_conv0 (dup alias HR_conv0_new.0)
    put_conv(sd, "HR_conv0_new.0", nf, nf)
    put_conv(sd, "HR_conv1_new", nf, nf)
    put_conv(sd, "b_fea_conv", nf, 3)
    for k in (1, 2, 3, 4):
        put_rrdb(sd, f"b_block_{k}", nf * 2)
        put_conv(sd, f"b_concat_{k}", nf, nf * 2)
    put_conv(sd, "b_LR_conv", nf, nf)
    put_conv(sd, "b_module.1", nf, nf)
    put_conv(sd, "b_module.4", nf, nf)
    put_conv(sd, "b_module.6", nf, nf)
    put_conv(sd, "b_module.8", nf, nf)
    put_conv(sd, "conv_w", 3, nf, k=1)
    put_conv(sd, "f_concat", nf, nf * 2)
    put_rrdb(sd, "f_block", nf * 2)
    put_conv(sd, "f_HR_conv0.0", nf, nf)
    put_conv(sd, "f_HR_conv1", 3, nf)
    path = str(tmp_path / "spsr.pth")
    torch.save({"params": sd}, path)

    net = build_network(dict(type="SPSRNet", nf=nf, nb=nb, gc=gc, upscale=4))
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    loaded = load_params_auto(path, "params", ref["params"])
    assert loaded is not None
    outs = net.apply({"params": loaded}, jnp.ones((1, 8, 8, 3)) * 0.5)
    assert outs[0].shape == (1, 32, 32, 3) and outs[1].shape == (1, 32, 32, 3)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
    # trunk block 0 first conv must land at rb_0
    np.testing.assert_array_equal(
        np.asarray(loaded["rb_0"]["ResidualDenseBlock_0"]["Conv3x3_0"]["Conv_0"]["kernel"]),
        sd["model.1.sub.0.RDB1.conv1.0.weight"].numpy().transpose(2, 3, 1, 0))


def test_elan_conversion(tmp_path):
    """Reference ELAN layout (ShiftConv2d1 + shared-attention GMSA) -> our tree."""
    c, m_elan, n_share, r_exp = 12, 2, 1, 2
    rng = np.random.RandomState(6)

    def c1x1(co, ci):
        return (torch.from_numpy(rng.randn(co, ci, 1, 1).astype(np.float32) * 0.1),
                torch.from_numpy(0.01 * rng.randn(co).astype(np.float32)))

    sd = {}
    sd["head.0.weight"] = torch.from_numpy(rng.randn(c, 3, 3, 3).astype(np.float32) * 0.1)
    sd["head.0.bias"] = torch.zeros(c)
    sd["tail.0.weight"] = torch.from_numpy(rng.randn(48, c, 3, 3).astype(np.float32) * 0.1)
    sd["tail.0.bias"] = torch.zeros(48)
    for i in range(m_elan // (1 + n_share)):
        for j in range(1 + n_share):
            lfe = f"body.{i}.modules_lfe.lfe_{j}"
            for cc, (co, ci) in enumerate([(c * r_exp, c), (c, c * r_exp)]):
                w, b = c1x1(co, ci)
                sd[f"{lfe}.conv{cc}.shift_conv.conv1x1.weight"] = w
                sd[f"{lfe}.conv{cc}.shift_conv.conv1x1.bias"] = b
                sd[f"{lfe}.conv{cc}.shift_conv.weight"] = torch.zeros(ci, 1, 3, 3)  # fixed, skipped
            g = f"body.{i}.modules_gmsa.gmsa_{j}"
            pc = c * 2 if j == 0 else c
            w, b = c1x1(pc, c)
            sd[f"{g}.project_inp.0.weight"], sd[f"{g}.project_inp.0.bias"] = w, b
            sd[f"{g}.project_inp.1.norm.weight"] = torch.ones(pc)
            sd[f"{g}.project_inp.1.norm.bias"] = torch.zeros(pc)
            w, b = c1x1(c, c)
            sd[f"{g}.project_out.weight"], sd[f"{g}.project_out.bias"] = w, b
    path = str(tmp_path / "elan.pth")
    torch.save({"params": sd}, path)

    net = build_network(dict(type="ELAN", c_elan=c, m_elan=m_elan, n_share=n_share,
                             window_sizes=[2, 4, 8], scale=4))
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    loaded = load_params_auto(path, "params", ref["params"])
    assert loaded is not None
    out = net.apply({"params": loaded}, jnp.ones((1, 8, 8, 3)) * 0.5)
    assert out.shape == (1, 32, 32, 3) and np.isfinite(np.asarray(out)).all()


def test_msrresnet_srvgg_export_roundtrip(tmp_path):
    """flax -> reference layout -> flax bit-exact for MSRResNet and SRVGG."""
    from ssl_tpu.utils.weight_port import (export_msrresnet_to_torch,
                                           export_srvgg_to_torch)
    for arch, exporter, fname in (
            (dict(type="MSRResNet", num_feat=8, num_block=2, upscale=4),
             export_msrresnet_to_torch, "msr.pth"),
            (dict(type="SRVGGNetCompact", num_feat=8, num_conv=2, upscale=4),
             export_srvgg_to_torch, "srvgg.pth")):
        net = build_network(dict(arch))
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        path = str(tmp_path / fname)
        exporter(v["params"], path)
        loaded = load_params_auto(path, "params", v["params"])
        assert loaded is not None
        for (pa, la), (pb, lb) in zip(jax.tree_util.tree_leaves_with_path(v["params"]),
                                      jax.tree_util.tree_leaves_with_path(loaded)):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_old_rrdbnet_kair_conversion(tmp_path):
    """KAIR/old-ESRGAN 'model.*' layout -> BSRGANRRDBNet (x4)."""
    nf, gc, nb = 8, 4, 2
    rng = np.random.RandomState(7)

    def put_conv(sd, base, co, ci):
        sd[f"{base}.weight"] = torch.from_numpy(rng.randn(co, ci, 3, 3).astype(np.float32) * 0.05)
        sd[f"{base}.bias"] = torch.from_numpy(0.01 * rng.randn(co).astype(np.float32))

    sd = {}
    put_conv(sd, "model.0", nf, 3)
    for i in range(nb):
        for j in (1, 2, 3):
            cin = nf
            for k in (1, 2, 3, 4, 5):
                co = gc if k < 5 else nf
                key = f"model.1.sub.{i}.RDB{j}.conv{k}" + (".0" if k < 5 else "")
                put_conv(sd, key, co, cin)
                cin = cin + gc if k < 5 else cin
    put_conv(sd, f"model.1.sub.{nb}", nf, nf)
    put_conv(sd, "model.3", nf, nf)    # upconv1
    put_conv(sd, "model.6", nf, nf)    # upconv2
    put_conv(sd, "model.8", nf, nf)    # HRconv
    put_conv(sd, "model.10", 3, nf)    # conv_last
    path = str(tmp_path / "bsrgan.pth")
    torch.save(sd, path)  # KAIR saves bare state dicts

    net = build_network(dict(type="BSRGANRRDBNet", nf=nf, nb=nb, gc=gc, sf=4))
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    loaded = load_params_auto(path, "params", ref["params"])
    assert loaded is not None
    out = net.apply({"params": loaded}, jnp.ones((1, 8, 8, 3)) * 0.5)
    assert out.shape == (1, 32, 32, 3) and np.isfinite(np.asarray(out)).all()


def test_vgg296_disc_conversion(tmp_path):
    """Discriminator_VGG_296 layout resolves to the nested _VGGDownStack tree
    (multi-converter disambiguation by shape match)."""
    from ssl_tpu.utils.weight_port import vgg296_disc_batch_stats, load_torch_state_dict
    nf = 4
    rng = np.random.RandomState(8)
    sd = {"conv0_0.weight": torch.from_numpy(rng.randn(nf, 3, 3, 3).astype(np.float32) * 0.1),
          "conv0_0.bias": torch.zeros(nf)}
    plan = [("conv0_1", nf, nf, 4)]
    cin = nf
    for i, mult in enumerate((2, 4, 8, 8), start=1):
        f = nf * mult
        plan += [(f"conv{i}_0", f, cin, 3), (f"conv{i}_1", f, f, 4)]
        cin = f
    for name, co, ci, k in plan:
        sd[f"{name}.weight"] = torch.from_numpy(rng.randn(co, ci, k, k).astype(np.float32) * 0.1)
        bn = name.replace("conv", "bn")
        sd[f"{bn}.weight"] = torch.ones(co)
        sd[f"{bn}.bias"] = torch.zeros(co)
        sd[f"{bn}.running_mean"] = torch.zeros(co)
        sd[f"{bn}.running_var"] = torch.ones(co)
    # 296 -> 9x9 spatial at the head
    sd["linear1.weight"] = torch.from_numpy(rng.randn(100, cin * 81).astype(np.float32) * 0.01)
    sd["linear1.bias"] = torch.zeros(100)
    sd["linear2.weight"] = torch.from_numpy(rng.randn(1, 100).astype(np.float32) * 0.01)
    sd["linear2.bias"] = torch.zeros(1)
    path = str(tmp_path / "d296.pth")
    torch.save({"params": sd}, path)

    net = build_network(dict(type="Discriminator_VGG_296", nf=nf))
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 296, 296, 3)))
    loaded = load_params_auto(path, "params", ref["params"])
    assert loaded is not None and "_VGGDownStack_0" in loaded
    bs = vgg296_disc_batch_stats(load_torch_state_dict(path), ref["batch_stats"])
    out = net.apply({"params": loaded, "batch_stats": bs},
                    jnp.ones((1, 296, 296, 3)) * 0.5, False)
    assert out.shape == (1, 1) and np.isfinite(np.asarray(out)).all()


def test_unet_disc_sn_export_roundtrip(tmp_path):
    """flax UNet-SN D -> torch spectral_norm layout -> flax bit-exact kernels,
    with the exported weight_u giving sigma == top singular value."""
    from ssl_tpu.utils.weight_port import export_unet_disc_sn_to_torch
    net = build_network(dict(type="UNetDiscriminatorSN", num_feat=4))
    v = net.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)))
    path = str(tmp_path / "net_d.pth")
    export_unet_disc_sn_to_torch(v["params"], path)
    sd = torch.load(path, weights_only=False)["params"]
    assert "conv1.weight_orig" in sd and "conv1.weight_u" in sd
    # sigma from exported (u, v) must match SVD of the flattened kernel
    a = sd["conv1.weight_orig"].numpy().reshape(sd["conv1.weight_orig"].shape[0], -1)
    sigma = float(sd["conv1.weight_u"].numpy() @ a @ sd["conv1.weight_v"].numpy())
    np.testing.assert_allclose(sigma, np.linalg.svd(a, compute_uv=False)[0], rtol=1e-3)
    loaded = load_params_auto(path, "params", v["params"])
    assert loaded is not None
    for (pa, la), (pb, lb) in zip(jax.tree_util.tree_leaves_with_path(v["params"]),
                                  jax.tree_util.tree_leaves_with_path(loaded)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
