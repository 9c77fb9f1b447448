"""HiFaceGAN — SPADE-based face renovation GAN.

Full-fidelity NHWC flax rewrite of the diffusion-tree vendored
basicsr/archs/hifacegan_arch.py + hifacegan_util.py: SPADE conditional
normalization, spectral-normalized SPADE ResNet blocks, the LIP
(local-importance pooling) encoder, the SPADE generator and the pix2pixHD-
style multiscale patch discriminator.  Converters in utils/weight_port.py;
oracle-parity tests in tests/test_reference_parity_zoo.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.utils.registry import ARCH_REGISTRY


def _nearest_resize(x, size):
    """F.interpolate(mode='nearest'): src index = floor(i * in/out)."""
    b, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    iy = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, iy][:, :, ix]


def _up2x(x):
    """nn.Upsample(scale_factor=2) default nearest."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def _instance_norm(x, eps=1e-5):
    """InstanceNorm2d(affine=False): per-sample per-channel over (h, w)."""
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class _SNConv(nn.Module):
    """Spectral-normalized conv (power-iteration state in batch_stats)."""
    features: int
    kernel: tuple = (3, 3)
    strides: int = 1
    padding: object = "SAME"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        conv = nn.Conv(self.features, self.kernel, strides=self.strides,
                       padding=self.padding, use_bias=self.use_bias)
        return nn.SpectralNorm(conv)(x, update_stats=update_stats)


class SPADE(nn.Module):
    """SPADE conditional norm (hifacegan_util.py:12-54), instance-norm
    variant (the shipped 'syncbatch' config falls back to instance norm on
    single-device, hifacegan_util.py:25-26), ks=3."""

    @nn.compact
    def __call__(self, x, seg):
        c = x.shape[-1]
        normalized = _instance_norm(x)
        seg = _nearest_resize(seg, (x.shape[1], x.shape[2]))
        nhidden = 128 if c > 128 else c
        a = nn.relu(nn.Conv(nhidden, (3, 3), padding="SAME",
                            name="mlp_shared")(seg))
        gamma = nn.Conv(c, (3, 3), padding="SAME", use_bias=False,
                        name="mlp_gamma")(a)
        beta = nn.Conv(c, (3, 3), padding="SAME", use_bias=False,
                       name="mlp_beta")(a)
        return normalized * gamma + beta


class SPADEResnetBlock(nn.Module):
    """SPADE ResNet block with spectral-normalized convs
    (hifacegan_util.py:57-110)."""
    fout: int

    @nn.compact
    def __call__(self, x, seg, update_stats: bool = False):
        fin = x.shape[-1]
        fmiddle = min(fin, self.fout)
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        if fin != self.fout:
            x_s = _SNConv(self.fout, (1, 1), use_bias=False, name="conv_s")(
                SPADE(name="norm_s")(x, seg), update_stats)
        else:
            x_s = x
        dx = _SNConv(fmiddle, (3, 3), name="conv_0")(
            lrelu(SPADE(name="norm_0")(x, seg)), update_stats)
        dx = _SNConv(self.fout, (3, 3), name="conv_1")(
            lrelu(SPADE(name="norm_1")(dx, seg)), update_stats)
        return x_s + dx


def _lip2d(x, logit):
    """Local importance pooling (hifacegan_util.py:154-156): ratio of
    3x3/s2/p1 average pools — divisor-independent, so plain sum pools."""
    w = jnp.exp(logit)
    num = nn.avg_pool(x * w, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    den = nn.avg_pool(w, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    return num / den


class LIPEncoder(nn.Module):
    """Local-importance-pooling encoder (hifacegan_util.py:182-214)."""
    ngf: int
    n_2xdown: int = 5
    max_ratio: int = 16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ngf, (3, 3), padding="SAME", use_bias=False,
                    name="conv_in")(x)
        x = _instance_norm(x)
        x = nn.relu(x)
        cur = 1
        for i in range(self.n_2xdown):
            nxt = min(cur * 2, self.max_ratio)
            # SimplifiedLIP: conv(no bias) + affine instance norm + sigmoid*12
            logit = nn.Conv(x.shape[-1], (3, 3), padding="SAME", use_bias=False,
                            name=f"block{i}_lip_conv")(x)
            logit = nn.GroupNorm(num_groups=logit.shape[-1], epsilon=1e-5,
                                 name=f"block{i}_lip_norm")(logit)
            logit = jax.nn.sigmoid(logit) * 12.0
            x = _lip2d(x, logit)
            x = nn.Conv(self.ngf * nxt, (3, 3), padding="SAME",
                        name=f"block{i}_conv")(x)
            x = _instance_norm(x)
            cur = nxt
            if i < self.n_2xdown - 1:
                x = nn.relu(x)
        return x


class _SPADEGeneratorBody(nn.Module):
    """Shared SPADE decoder (hifacegan_arch.py:40-94)."""
    num_feat: int
    is_train: bool = True
    init_train_phase: int = 3

    @nn.compact
    def __call__(self, x, seg, update_stats: bool = False):
        nf = self.num_feat
        x = SPADEResnetBlock(16 * nf, name="head_0")(x, seg, update_stats)
        x = _up2x(x)
        x = SPADEResnetBlock(16 * nf, name="g_middle_0")(x, seg, update_stats)
        x = SPADEResnetBlock(16 * nf, name="g_middle_1")(x, seg, update_stats)
        phase = self.init_train_phase + 1 if self.is_train else 4
        ups_feats = (8 * nf, 4 * nf, 2 * nf, nf)
        for i in range(phase):
            x = _up2x(x)
            x = SPADEResnetBlock(ups_feats[i], name=f"ups_{i}")(x, seg, update_stats)
        x = nn.Conv(3, (3, 3), padding="SAME", name=f"to_rgbs_{phase - 1}")(
            nn.leaky_relu(x, 0.2))
        return jnp.tanh(x)


@ARCH_REGISTRY.register()
class SPADEGenerator(nn.Module):
    """Plain SPADE generator (hifacegan_arch.py:10-94): nearest-downsampled
    input through a 3x3 'fc' conv, then the SPADE decoder."""
    num_in_ch: int = 3
    num_feat: int = 64
    crop_size: int = 512
    is_train: bool = True
    init_train_phase: int = 3
    scale_ratio: int = 5

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        h, w = x.shape[1], x.shape[2]
        sh, sw = h // 2 ** self.scale_ratio, w // 2 ** self.scale_ratio
        enc = _nearest_resize(x, (sh, sw))
        enc = nn.Conv(16 * self.num_feat, (3, 3), padding="SAME", name="fc")(enc)
        return _SPADEGeneratorBody(self.num_feat, self.is_train,
                                   self.init_train_phase, name="body")(
            enc, x, update_stats)


@ARCH_REGISTRY.register()
class HiFaceGAN(nn.Module):
    """HiFaceGAN (hifacegan_arch.py:144-164): SPADE generator with a
    learnable LIP encoder."""
    num_in_ch: int = 3
    num_feat: int = 64
    crop_size: int = 512
    is_train: bool = True
    init_train_phase: int = 3
    scale_ratio: int = 5

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        enc = LIPEncoder(self.num_feat, self.scale_ratio, name="lip_encoder")(x)
        return _SPADEGeneratorBody(self.num_feat, self.is_train,
                                   self.init_train_phase, name="body")(
            enc, x, update_stats)


class _NLayerDiscriminator(nn.Module):
    """PatchGAN sub-discriminator (hifacegan_arch.py:223-260),
    spectral+instance norm."""
    n_layers_d: int = 4
    num_feat: int = 64
    keep_features: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        results = []
        nf = self.num_feat
        y = lrelu(nn.Conv(nf, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                          name="model0_conv")(x))
        results.append(y)
        for n in range(1, self.n_layers_d):
            nf = min(nf * 2, 512)
            stride = 1 if n == self.n_layers_d - 1 else 2
            y = _SNConv(nf, (4, 4), strides=stride, padding=((2, 2), (2, 2)),
                        use_bias=False, name=f"model{n}_conv")(y, update_stats)
            y = lrelu(_instance_norm(y))
            results.append(y)
        y = nn.Conv(1, (4, 4), padding=((2, 2), (2, 2)),
                    name=f"model{self.n_layers_d}_conv")(y)
        results.append(y)
        return results if self.keep_features else results[-1]


@ARCH_REGISTRY.register()
class HiFaceGANDiscriminator(nn.Module):
    """Multiscale patch discriminator (hifacegan_arch.py:167-220).
    Input: the (optionally condition-concatenated) image.  Returns
    num_d lists of per-layer features (last entry = logits)."""
    num_in_ch: int = 3
    num_out_ch: int = 3
    conditional_d: bool = True
    num_d: int = 2
    n_layers_d: int = 4
    num_feat: int = 64
    keep_features: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        result = []
        for i in range(self.num_d):
            result.append(_NLayerDiscriminator(
                self.n_layers_d, self.num_feat, self.keep_features,
                name=f"discriminator_{i}")(x, update_stats))
            x = nn.avg_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), count_include_pad=False)
        return result
