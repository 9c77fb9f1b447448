"""Oracle-parity for the remaining GAN-tree arch families (Tier 2 in
STATUS.md): the reference's own torch modules from
/root/reference/GAN-Based-SR/basicsr/archs run on CPU as oracles, weights
travel through the repo converters."""
from __future__ import annotations

import pytest

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from ref_loader import ref_module  # noqa: E402

pytestmark = pytest.mark.slow

torch.manual_seed(0)


def _convert(ref_net, our_opt, save_key="params"):
    from ssl_tpu.archs import build_network
    from ssl_tpu.utils.weight_port import load_params_auto
    td = tempfile.mkdtemp()
    path = os.path.join(td, "ref.pth")
    torch.save({save_key: ref_net.state_dict()}, path)
    net = build_network(dict(our_opt))
    return net, path, load_params_auto


def _simple_parity(ref_net, our_opt, x_nchw, rtol=2e-5, atol=2e-6):
    ref_net.eval()
    with torch.no_grad():
        y_ref = ref_net(torch.from_numpy(x_nchw)).numpy()
    net, path, load_params_auto = _convert(ref_net, our_opt)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    variables = net.init(jax.random.PRNGKey(0), x)
    params = load_params_auto(path, "params", variables["params"])
    assert params is not None, f"converter failed for {our_opt['type']}"
    out = net.apply({"params": params}, x)
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, y_ref, rtol=rtol, atol=atol)


def test_bsrgan_rrdbnet_parity():
    arch = ref_module("basicsr.archs.bsrgan_arch")
    ref = arch.BSRGANRRDBNet(3, 3, nf=16, nb=2, gc=8, sf=4)
    x = np.random.RandomState(0).rand(1, 3, 12, 12).astype(np.float32)
    _simple_parity(ref, dict(type="BSRGANRRDBNet", nf=16, nb=2, gc=8, sf=4), x)


def test_bsrgan_rrdbnet_sf2_parity():
    arch = ref_module("basicsr.archs.bsrgan_arch")
    ref = arch.BSRGANRRDBNet(3, 3, nf=16, nb=1, gc=8, sf=2)
    x = np.random.RandomState(1).rand(1, 3, 12, 12).astype(np.float32)
    _simple_parity(ref, dict(type="BSRGANRRDBNet", nf=16, nb=1, gc=8, sf=2), x)


def test_rrdbbebygan_parity():
    arch = ref_module("basicsr.archs.rrdbbebygan_arch")
    ref = arch.RRDBBebyGANNet(3, 3, nf=16, nb=2, gc=8)
    x = np.random.RandomState(2).rand(1, 3, 12, 12).astype(np.float32)
    _simple_parity(ref, dict(type="RRDBBebyGANNet", nf=16, nb=2, gc=8), x)


def test_ranksrgan_srresnet_parity():
    arch = ref_module("basicsr.archs.ranksrgan_arch")
    ref = arch.RankSRGANSRResNet(3, 3, nf=16, nb=2, upscale=4)
    x = np.random.RandomState(3).rand(1, 3, 12, 12).astype(np.float32)
    _simple_parity(ref, dict(type="RankSRGANSRResNet", nf=16, nb=2, upscale=4), x)


def test_rrdbps_parity():
    arch = ref_module("basicsr.archs.rrdbnet_arch")
    ref = arch.RRDBPSNet(3, 3, scale=2, num_feat=16, num_block=1, num_grow_ch=8)
    x = np.random.RandomState(4).rand(1, 3, 12, 12).astype(np.float32)
    _simple_parity(ref, dict(type="RRDBPSNet", scale=2, num_feat=16,
                             num_block=1, num_grow_ch=8), x)


def test_rrdbmean_parity():
    arch = ref_module("basicsr.archs.rrdbnet_arch")
    ref = arch.RRDBMeanNet(3, 3, scale=4, num_feat=16, num_block=2, num_grow_ch=8)
    x = np.random.RandomState(5).rand(1, 3, 12, 12).astype(np.float32)
    _simple_parity(ref, dict(type="RRDBMeanNet", scale=4, num_feat=16,
                             num_block=2, num_grow_ch=8), x)


def test_unet_disc_snv1_parity():
    arch = ref_module("basicsr.archs.discriminator_arch")
    ref = arch.UNetDiscriminatorSNv1(3, num_feat=8, skip_connection=True)
    x = np.random.RandomState(6).rand(1, 3, 25, 25).astype(np.float32)
    # exact top singular pair into the torch SN buffers (random kernels have
    # near-degenerate spectra; power iteration does not converge)
    from ssl_tpu.utils.weight_port import top_singular_pair
    with torch.no_grad():
        for _name, mod in ref.named_modules():
            if hasattr(mod, "weight_orig"):
                a = mod.weight_orig.detach().reshape(mod.weight_orig.shape[0], -1).numpy()
                u, _s, v = top_singular_pair(a)
                mod.weight_u.copy_(torch.from_numpy(u))
                mod.weight_v.copy_(torch.from_numpy(v))
    ref.eval()
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()
    net, path, load_params_auto = _convert(
        ref, dict(type="UNetDiscriminatorSNv1", num_feat=8))
    from ssl_tpu.utils.weight_port import (load_torch_state_dict,
                                           sn_batch_stats_from_torch)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = net.init(jax.random.PRNGKey(0), xj)
    params = load_params_auto(path, "params", variables["params"])
    assert params is not None
    stats = sn_batch_stats_from_torch(load_torch_state_dict(path, "params"),
                                      variables.get("batch_stats", {}))
    out = net.apply({"params": params, "batch_stats": stats}, xj, train=False)
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, y_ref, rtol=5e-3, atol=5e-4)


def test_mod_parity():
    arch = ref_module("basicsr.archs.discriminator_arch")
    ref = arch.MOD(3, num_feat=16, num_expert=4)
    # randomize BN stats so eval-mode normalization is non-trivial
    g = torch.Generator().manual_seed(16)
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if "running_mean" in name:
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
            elif "running_var" in name:
                buf.copy_(1.0 + 0.3 * torch.rand(buf.shape, generator=g))
    x = np.random.RandomState(7).rand(2, 3, 32, 32).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        out_t, routing_t, feats_t, ortho_t = ref(torch.from_numpy(x))

    net, path, load_params_auto = _convert(
        ref, dict(type="MOD", num_feat=16, num_expert=4))
    from ssl_tpu.utils.weight_port import load_torch_state_dict, mod_batch_stats
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = net.init(jax.random.PRNGKey(0), xj)
    params = load_params_auto(path, "params", variables["params"])
    assert params is not None
    stats = mod_batch_stats(load_torch_state_dict(path, "params"),
                            variables.get("batch_stats", {}))
    out, routing, parts, ortho = net.apply(
        {"params": params, "batch_stats": stats}, xj, train=False)
    np.testing.assert_allclose(np.asarray(out), out_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(routing), routing_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(parts[0]), feats_t[0].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_spsr_net_parity():
    arch = ref_module("basicsr.archs.spsr_arch")
    # the reference forward HARDCODES 23 trunk blocks (spsr_arch.py:378-393)
    ref = arch.SPSRNet(3, 3, 8, 23, gc=4, upscale=4)
    x = np.random.RandomState(8).rand(1, 3, 12, 12).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        ref_branch, ref_sr, ref_grad = ref(torch.from_numpy(x))
    net, path, load_params_auto = _convert(
        ref, dict(type="SPSRNet", nf=8, nb=23, gc=4, upscale=4))
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = net.init(jax.random.PRNGKey(0), xj)
    params = load_params_auto(path, "params", variables["params"])
    assert params is not None
    out_branch, sr, lq_grad = net.apply({"params": params}, xj)
    np.testing.assert_allclose(np.transpose(np.asarray(sr), (0, 3, 1, 2)),
                               ref_sr.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.transpose(np.asarray(out_branch), (0, 3, 1, 2)),
                               ref_branch.numpy(), rtol=1e-4, atol=1e-5)


def _randomize_bn(ref, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if "running_mean" in name:
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
            elif "running_var" in name:
                buf.copy_(1.0 + 0.3 * torch.rand(buf.shape, generator=g))
    return ref


def test_vgg_style_disc_parity():
    arch = ref_module("basicsr.archs.discriminator_arch")
    ref = _randomize_bn(arch.VGGStyleDiscriminator(3, 16, input_size=128), 20)
    x = np.random.RandomState(9).rand(2, 3, 128, 128).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()
    net, path, load_params_auto = _convert(
        ref, dict(type="VGGStyleDiscriminator", num_feat=16, input_size=128))
    from ssl_tpu.utils.weight_port import (load_torch_state_dict,
                                           vgg_disc_batch_stats)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = net.init(jax.random.PRNGKey(0), xj)
    params = load_params_auto(path, "params", variables["params"])
    assert params is not None
    stats = vgg_disc_batch_stats(load_torch_state_dict(path, "params"),
                                 variables.get("batch_stats", {}))
    out = net.apply({"params": params, "batch_stats": stats}, xj, train=False)
    np.testing.assert_allclose(np.asarray(out), y_ref, rtol=1e-3, atol=1e-4)


def test_disc_vgg_296_and_ranker_parity():
    arch = ref_module("basicsr.archs.ranksrgan_arch")
    for torch_cls, our_type, stats_fn_name in (
            (arch.Discriminator_VGG_296, "Discriminator_VGG_296", "vgg296_disc_batch_stats"),
            (arch.Ranker_VGG12_296, "Ranker_VGG12_296", "ranker_batch_stats")):
        # nf must be 64: the reference hardcodes linear1 = Linear(512*9*9, 100)
        ref = _randomize_bn(torch_cls(3, 64), 21)
        x = np.random.RandomState(10).rand(1, 3, 296, 296).astype(np.float32)
        ref.eval()
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x)).numpy()
        net, path, load_params_auto = _convert(ref, dict(type=our_type, nf=64))
        import ssl_tpu.utils.weight_port as wp
        xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        variables = net.init(jax.random.PRNGKey(0), xj)
        params = load_params_auto(path, "params", variables["params"])
        assert params is not None, our_type
        stats = getattr(wp, stats_fn_name)(
            wp.load_torch_state_dict(path, "params"),
            variables.get("batch_stats", {}))
        out = net.apply({"params": params, "batch_stats": stats}, xj, train=False)
        np.testing.assert_allclose(np.asarray(out), y_ref, rtol=1e-3, atol=1e-4,
                                   err_msg=our_type)


def test_disc_vgg_192_parity():
    """Discriminator_VGG_192 == VGGStyleDiscriminator(192) layer-for-layer;
    our wrapper + the vgg_style converter must reproduce it."""
    arch = ref_module("basicsr.archs.discriminator_arch")
    ref = _randomize_bn(arch.Discriminator_VGG_192(3, 64), 22)
    x = np.random.RandomState(11).rand(1, 3, 192, 192).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()
    net, path, load_params_auto = _convert(
        ref, dict(type="Discriminator_VGG_192", num_feat=64))
    from ssl_tpu.utils.weight_port import (load_torch_state_dict,
                                           vgg_disc_batch_stats)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = net.init(jax.random.PRNGKey(0), xj)
    params = load_params_auto(path, "params", variables["params"])
    assert params is not None
    stats = vgg_disc_batch_stats(load_torch_state_dict(path, "params"),
                                 variables.get("batch_stats", {}))
    out = net.apply({"params": params, "batch_stats": stats}, xj, train=False)
    np.testing.assert_allclose(np.asarray(out), y_ref, rtol=1e-3, atol=1e-4)


def test_disc_sn_vgg_192_parity():
    arch = ref_module("basicsr.archs.discriminator_arch")
    ref = arch.DiscriminatorSN_VGG_192(3, 64)
    from ssl_tpu.utils.weight_port import top_singular_pair
    with torch.no_grad():
        for _name, mod in ref.named_modules():
            if hasattr(mod, "weight_orig"):
                a = mod.weight_orig.detach().reshape(mod.weight_orig.shape[0], -1).numpy()
                u, _s, v = top_singular_pair(a)
                mod.weight_u.copy_(torch.from_numpy(u))
                mod.weight_v.copy_(torch.from_numpy(v))
    x = np.random.RandomState(12).rand(1, 3, 192, 192).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()
    net, path, load_params_auto = _convert(
        ref, dict(type="DiscriminatorSN_VGG_192", num_feat=64))
    from ssl_tpu.utils.weight_port import load_torch_state_dict, sn_vgg192_stats
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = net.init(jax.random.PRNGKey(0), xj)
    params = load_params_auto(path, "params", variables["params"])
    assert params is not None
    stats = sn_vgg192_stats(load_torch_state_dict(path, "params"),
                            variables.get("batch_stats", {}))
    out = net.apply({"params": params, "batch_stats": stats}, xj, train=False)
    np.testing.assert_allclose(np.asarray(out), y_ref, rtol=5e-3, atol=5e-4)
