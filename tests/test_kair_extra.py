"""Oracle parity for the remaining KAIR net_type surface
(train_BSGRAN/models/select_network.py branches whose module files exist):

- Discriminator_PatchGAN (spectral / batch / instance norm_type)
- Discriminator_VGG_96 / _128 / _192 (KAIR flavor: bare head conv, BN
  momentum 0.9 eps 1e-4 — distinct from basicsr's VGGStyleDiscriminator)
- Discriminator_VGG_128_SN (SN convs + SN linears)
- MSRResNet0 (old flat ESRGAN layout, ReLU, no bilinear base)
- network_rrdb.RRDB -> our RRDBNet via the old-flat-layout converter

The reference modules are executed on CPU (tests/ref_loader.kair_models_module);
net types with ABSENT module files (dncnn/ffdnet/srmd/dpsr/imdn/usrnet/
drunet/vrt/rvrt) are ImportError in the reference itself — documented N/A.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_loader import kair_models_module

pytestmark = pytest.mark.slow


def _state(ref):
    return {k: v.detach() for k, v in ref.state_dict().items()}


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _cmp(y_ours, y_ref, rtol=1e-4, atol=1e-5):
    y_ours = np.asarray(y_ours)
    y_ref = y_ref.detach().numpy()
    if y_ours.ndim == 4:
        y_ours = np.transpose(y_ours, (0, 3, 1, 2))
    np.testing.assert_allclose(y_ours, y_ref, rtol=rtol, atol=atol)


def _converge_sn(ref, x, iters=100):
    ref.train()
    with torch.no_grad():
        for _ in range(iters):
            ref(torch.from_numpy(x))
    ref.eval()


@pytest.mark.parametrize("norm_type", ["spectral", "batch", "instance"])
def test_patchgan_parity(norm_type):
    from ssl_tpu.archs.kair_extra_arch import KAIRDiscriminatorPatchGAN
    from ssl_tpu.utils.weight_port import (convert_kair_patchgan,
                                           kair_patchgan_batch_stats, _as_jnp)

    nd = kair_models_module("network_discriminator")
    ref = nd.Discriminator_PatchGAN(input_nc=3, ndf=8, n_layers=3,
                                    norm_type=norm_type)
    x = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    sn = "spectral" in norm_type
    if sn:
        _converge_sn(ref, x)
    else:
        ref.eval()
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x))

    net = KAIRDiscriminatorPatchGAN(ndf=8, n_layers=3, norm_type=norm_type)
    variables = net.init(jax.random.PRNGKey(0), _nhwc(x), train=False)
    sd = _state(ref)
    params = _as_jnp(convert_kair_patchgan(sd, norm_type))
    stats = variables.get("batch_stats", {})
    if sn:
        stats = _as_jnp(kair_patchgan_batch_stats(sd, stats, norm_type))
    out = net.apply({"params": params, "batch_stats": dict(stats)}, _nhwc(x),
                    train=False)
    # atol 5e-5: near-zero outputs flip the last ulp depending on XLA CPU
    # fusion order (seen 1/49 at 1.8e-5 under xdist); values are O(0.1-1)
    _cmp(out, y_ref, rtol=5e-3 if sn else 1e-4, atol=5e-4 if sn else 5e-5)


@pytest.mark.parametrize("size,cls_name", [(96, "Discriminator_VGG_96"),
                                           (128, "Discriminator_VGG_128"),
                                           (192, "Discriminator_VGG_192")])
def test_kair_vgg_d_parity(size, cls_name):
    from ssl_tpu.archs import kair_extra_arch as A
    from ssl_tpu.utils.weight_port import (convert_kair_vgg_d,
                                           kair_vgg_d_batch_stats, _as_jnp)

    nd = kair_models_module("network_discriminator")
    ref = getattr(nd, cls_name)()          # base_nc=64 (classifier hardcodes 512)
    ref.eval()
    x = np.random.RandomState(size).rand(1, 3, size, size).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x))

    net = getattr(A, f"KAIRDiscriminatorVGG{size}")()
    sd = _state(ref)
    params = _as_jnp(convert_kair_vgg_d(sd))
    stats = _as_jnp(kair_vgg_d_batch_stats(sd))
    out = net.apply({"params": params, "batch_stats": stats}, _nhwc(x),
                    train=False)
    _cmp(out, y_ref, rtol=2e-4, atol=2e-4)


def test_kair_vgg128_sn_parity():
    from ssl_tpu.archs.kair_extra_arch import KAIRDiscriminatorVGG128SN
    from ssl_tpu.utils.weight_port import (convert_kair_vgg128_sn,
                                           kair_vgg128_sn_stats, _as_jnp)

    nd = kair_models_module("network_discriminator")
    ref = nd.Discriminator_VGG_128_SN()
    x = np.random.RandomState(7).rand(1, 3, 128, 128).astype(np.float32)
    _converge_sn(ref, x, iters=60)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x))

    net = KAIRDiscriminatorVGG128SN()
    variables = net.init(jax.random.PRNGKey(0), _nhwc(x), train=False)
    sd = _state(ref)
    params = _as_jnp(convert_kair_vgg128_sn(sd))
    stats = _as_jnp(kair_vgg128_sn_stats(sd, variables["batch_stats"]))
    out = net.apply({"params": params, "batch_stats": stats}, _nhwc(x),
                    train=False)
    _cmp(out, y_ref, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("upscale", [4, 3])
def test_msrresnet0_parity(upscale):
    from ssl_tpu.archs.kair_extra_arch import KAIRMSRResNet0
    from ssl_tpu.utils.weight_port import convert_kair_msrresnet0, _as_jnp

    nm = kair_models_module("network_msrresnet")
    ref = nm.MSRResNet0(in_nc=3, out_nc=3, nc=16, nb=2, upscale=upscale,
                        act_mode="R", upsample_mode="upconv")
    ref.eval()
    x = np.random.RandomState(9).rand(1, 3, 12, 12).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x))

    net = KAIRMSRResNet0(nc=16, nb=2, upscale=upscale)
    params = _as_jnp(convert_kair_msrresnet0(_state(ref)))
    out = net.apply({"params": params}, _nhwc(x))
    _cmp(out, y_ref)


def test_network_rrdb_maps_to_bsrgan_rrdbnet():
    """net_type 'rrdb' (network_rrdb.py:14-54) is the classic flat ESRGAN
    graph — forward-equal to our BSRGANRRDBNet through convert_old_rrdbnet.
    NOTE the reference hardcodes gc=32 in the body regardless of its gc arg
    (network_rrdb.py:29), like every reference RRDB."""
    from ssl_tpu.archs.bsrgan_arch import BSRGANRRDBNet
    from ssl_tpu.utils.weight_port import convert_old_rrdbnet, _as_jnp

    nr = kair_models_module("network_rrdb")
    ref = nr.RRDB(in_nc=3, out_nc=3, nc=16, nb=2, upscale=4, act_mode="L",
                  upsample_mode="upconv")
    ref.eval()
    x = np.random.RandomState(11).rand(1, 3, 12, 12).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x))

    net = BSRGANRRDBNet(nf=16, nb=2, gc=32, sf=4)
    params = _as_jnp(convert_old_rrdbnet(_state(ref)))
    out = net.apply({"params": params}, _nhwc(x))
    _cmp(out, y_ref, rtol=2e-4, atol=2e-5)


def test_kair_adapter_new_net_types():
    """utils/kair_options.py resolves the completed net_type surface."""
    from ssl_tpu.utils.kair_options import kair_to_opt

    base = {"task": "t", "scale": 4,
            "datasets": {"train": {"dataset_type": "blindsrmask"}},
            "train": {"G_lossfn_type": "l1"}}
    opt = kair_to_opt({**base, "netG": {"net_type": "rrdb", "nc": 16, "nb": 2},
                       "netD": {"net_type": "discriminator_patchgan",
                                "n_layers": 3, "norm_type": "spectral"},
                       "model": "gan"})
    assert opt["network_g"]["type"] == "BSRGANRRDBNet"
    assert opt["network_g"]["gc"] == 32 and opt["network_g"]["nf"] == 16
    assert opt["network_d"]["type"] == "KAIRDiscriminatorPatchGAN"
    assert opt["network_d"]["norm_type"] == "spectral"

    opt2 = kair_to_opt({**base, "netG": {"net_type": "msrresnet0", "nc": 16,
                                         "nb": 2},
                        "netD": {"net_type": "discriminator_vgg_128_SN"},
                        "model": "gan"})
    assert opt2["network_g"]["type"] == "KAIRMSRResNet0"
    assert opt2["network_d"]["type"] == "KAIRDiscriminatorVGG128SN"
    opt3 = kair_to_opt({**base, "netG": {"net_type": "rrdbnet"},
                        "netD": {"net_type": "discriminator_vgg_96"},
                        "model": "gan"})
    assert opt3["network_d"]["type"] == "KAIRDiscriminatorVGG96"
