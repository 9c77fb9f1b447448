"""KAIR net_type surface: the remaining select_network branches.

Reference: train_BSGRAN/models/network_discriminator.py (Discriminator_PatchGAN
:22-87, Discriminator_VGG_96 :144-176, Discriminator_VGG_128 :182-216,
Discriminator_VGG_128_SN :263-311) and network_msrresnet.py (MSRResNet0
:38-77, old flat ESRGAN layout).  net types whose module files are absent
from the reference checkout (dncnn/ffdnet/srmd/dpsr/imdn/usrnet/drunet/
vrt/rvrt — select_network.py imports them but `models/network_*.py` does not
exist) are N/A: selecting them raises ImportError in the reference itself.

Already-covered mappings (utils/kair_options.py): `rrdb` -> RRDBNet through
the old-flat-layout converter (network_rrdb.py:14-54 is the classic ESRGAN
graph: head conv -> ShortcutBlock(RRDB body) -> nearest-up convs -> HR tail
— identical computation to RRDBNet), `msrresnet1` -> MSRResNet (bit-same
arch: lrelu 0.1, pixel-shuffle ups, bilinear base), `discriminator_unet` ->
UNetDiscriminatorSN (same rosinality design), `discriminator_vgg_192` /
`swinir` / `elan` -> existing archs.

All modules are NHWC flax; BN/SN state lives in 'batch_stats'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.utils.registry import ARCH_REGISTRY


def _lrelu(x):
    return nn.leaky_relu(x, 0.2)


def _conv(feats, k, stride=1, pad=None, bias=True, name=None):
    p = (k - 1) // 2 if pad is None else pad
    return nn.Conv(feats, (k, k), strides=stride, padding=((p, p), (p, p)),
                   use_bias=bias, name=name)


class _SNConv(nn.Module):
    """Spectral-normalized conv (power-iterate state in batch_stats)."""
    features: int
    kernel: int
    stride: int = 1
    pad: int | None = None
    bias: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        p = (self.kernel - 1) // 2 if self.pad is None else self.pad
        conv = nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=self.stride, padding=((p, p), (p, p)),
                       use_bias=self.bias)
        return nn.SpectralNorm(conv)(x, update_stats=update_stats)


class _SNDense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        return nn.SpectralNorm(nn.Dense(self.features))(x, update_stats=update_stats)


@ARCH_REGISTRY.register()
class KAIRDiscriminatorPatchGAN(nn.Module):
    """70x70 PatchGAN (network_discriminator.py:22-87): k4 convs with
    padding=ceil(3/2)=2, channel doubling capped at 512, optional spectral
    norm on every conv plus batch/instance norm between (norm_type in
    {'batch','instance','spectral','batchspectral','instancespectral'})."""
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    norm_type: str = "spectral"

    def _norm(self, x, train):
        if "batch" in self.norm_type:
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5)(x)
        if "instance" in self.norm_type:
            # torch InstanceNorm2d(affine=False): per-instance per-channel
            return nn.GroupNorm(num_groups=None, group_size=1,
                                use_bias=False, use_scale=False,
                                epsilon=1e-5)(x)
        return x

    def _c(self, feats, stride, x, train, name):
        # torch pad = ceil((4-1)/2) = 2 on every k4 conv
        if "spectral" in self.norm_type:
            return _SNConv(feats, 4, stride, pad=2, name=name)(x, update_stats=train)
        return nn.Conv(feats, (4, 4), strides=stride, padding=((2, 2), (2, 2)),
                       name=name)(x)

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = _lrelu(self._c(self.ndf, 2, x, train, "child0"))
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = _lrelu(self._norm(self._c(nf, 2, h, train, f"child{n}"), train))
        nf = min(nf * 2, 512)
        h = _lrelu(self._norm(self._c(nf, 1, h, train, f"child{self.n_layers}"), train))
        return self._c(1, 1, h, train, f"child{self.n_layers + 1}")


class _KAIRVGGFeatures(nn.Module):
    """The shared C / (C+BL) feature pyramid of the KAIR VGG discriminators:
    a bare k3 head conv (NO activation — unlike basicsr's VGGStyle D), then
    (k3 s1, k4 s2) pairs; B.conv 'B' is BatchNorm(momentum=0.9, eps=1e-4)."""
    base_nc: int
    n_pairs: int          # 96/128 -> 5 halvings, 192 -> 6
    ac_type: str = "BL"

    @nn.compact
    def __call__(self, x, train: bool = True):
        def act(v):
            if "B" in self.ac_type:
                v = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.1, epsilon=1e-4)(v)
            return _lrelu(v)

        mults = [1, 2, 4, 8, 8, 8][:self.n_pairs]
        h = _conv(self.base_nc, 3)(x)                 # conv0: no activation
        h = act(_conv(self.base_nc, 4, stride=2)(h))  # conv1
        for m in mults[1:]:
            h = act(_conv(self.base_nc * m, 3)(h))
            h = act(_conv(self.base_nc * m, 4, stride=2)(h))
        return h


class _KAIRVGGD(nn.Module):
    input_size: int
    in_nc: int = 3
    base_nc: int = 64
    ac_type: str = "BL"

    @nn.compact
    def __call__(self, x, train: bool = True):
        n_pairs = {96: 5, 128: 5, 192: 6}[self.input_size]
        h = _KAIRVGGFeatures(self.base_nc, n_pairs, self.ac_type)(x, train)
        # torch flattens NCHW; transpose so converted Linear weights line up
        h = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
        h = _lrelu(nn.Dense(100)(h))
        return nn.Dense(1)(h)


@ARCH_REGISTRY.register()
class KAIRDiscriminatorVGG96(_KAIRVGGD):
    input_size: int = 96


@ARCH_REGISTRY.register()
class KAIRDiscriminatorVGG128(_KAIRVGGD):
    input_size: int = 128


@ARCH_REGISTRY.register()
class KAIRDiscriminatorVGG192(_KAIRVGGD):
    input_size: int = 192


@ARCH_REGISTRY.register()
class KAIRDiscriminatorVGG128SN(nn.Module):
    """Spectral-norm VGG-128 D (network_discriminator.py:263-311): SN on all
    10 convs AND both classifier linears, lrelu everywhere, no BN."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        chans = [(64, 3, 1), (64, 4, 2), (128, 3, 1), (128, 4, 2),
                 (256, 3, 1), (256, 4, 2), (512, 3, 1), (512, 4, 2),
                 (512, 3, 1), (512, 4, 2)]
        h = x
        for i, (f, k, s) in enumerate(chans):
            h = _lrelu(_SNConv(f, k, s, name=f"conv{i}")(h, update_stats=train))
        h = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
        h = _lrelu(_SNDense(100, name="linear0")(h, update_stats=train))
        return _SNDense(1, name="linear1")(h, update_stats=train)


@ARCH_REGISTRY.register()
class KAIRMSRResNet0(nn.Module):
    """MSRResNet v0 (network_msrresnet.py:38-77): old flat ESRGAN layout —
    head conv, nb plain ResBlocks (C+R+C, ReLU, no BN) under a global inner
    shortcut, nearest-up + conv + ReLU per x2 stage, HR tail (last conv
    bias=False).  No bilinear base (unlike MSRResNet1)."""
    in_nc: int = 3
    out_nc: int = 3
    nc: int = 64
    nb: int = 16
    upscale: int = 4

    @nn.compact
    def __call__(self, x):
        feat = _conv(self.nc, 3, name="head")(x)
        h = feat
        for i in range(self.nb):
            r = nn.relu(_conv(self.nc, 3, name=f"b{i}_conv0")(h))
            h = h + _conv(self.nc, 3, name=f"b{i}_conv1")(r)
        h = feat + _conv(self.nc, 3, name="body_out")(h)
        n_up = {2: 1, 3: 1, 4: 2}[self.upscale]
        s = 3 if self.upscale == 3 else 2
        for i in range(n_up):
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * s, ww * s, c), method="nearest")
            h = nn.relu(_conv(self.nc, 3, name=f"up{i}")(h))
        h = nn.relu(_conv(self.nc, 3, name="hr")(h))
        return _conv(self.out_nc, 3, bias=False, name="tail")(h)
