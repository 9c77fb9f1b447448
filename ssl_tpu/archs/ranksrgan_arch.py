"""RankSRGAN: generator, 296-patch discriminator, frozen Ranker.

Reference parity: archs/ranksrgan_arch.py:54 (RankSRGANSRResNet),
:108 (Discriminator_VGG_296), :168 (Ranker_VGG12_296)."""

from __future__ import annotations

from flax import linen as nn

from ssl_tpu.archs.arch_util import Conv3x3, pixel_shuffle
from ssl_tpu.utils.registry import ARCH_REGISTRY


class _ResBlockReLU(nn.Module):
    nf: int = 64

    @nn.compact
    def __call__(self, x):
        out = nn.relu(Conv3x3(self.nf, init_scale=0.1)(x))
        out = Conv3x3(self.nf, init_scale=0.1)(out)
        return x + out


@ARCH_REGISTRY.register()
class RankSRGANSRResNet(nn.Module):
    """SRResNet flavor with residual LR skip (out+fea) into the upsampler."""
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    upscale: int = 4

    @nn.compact
    def __call__(self, x):
        fea = nn.Conv(self.nf, (3, 3), padding="SAME", name="conv_first")(x)
        out = fea
        for i in range(self.nb):
            out = _ResBlockReLU(self.nf, name=f"trunk_{i}")(out)
        out = nn.Conv(self.nf, (3, 3), padding="SAME", name="LRconv")(out)
        if self.upscale == 4:
            out = nn.relu(pixel_shuffle(
                nn.Conv(self.nf * 4, (3, 3), padding="SAME", name="upconv1")(out + fea), 2))
            out = nn.relu(pixel_shuffle(
                nn.Conv(self.nf * 4, (3, 3), padding="SAME", name="upconv2")(out), 2))
        else:
            s = self.upscale
            out = nn.relu(pixel_shuffle(
                nn.Conv(self.nf * s * s, (3, 3), padding="SAME", name="upconv1")(out + fea), s))
        out = nn.relu(nn.Conv(self.nf, (3, 3), padding="SAME", name="HRconv")(out))
        return nn.Conv(self.out_nc, (3, 3), padding="SAME", name="conv_last")(out)


class _VGGDownStack(nn.Module):
    """Conv(3)+Conv(4,s2) pairs with BN, 296-input geometry."""
    nf: int = 64
    stages: int = 5

    @nn.compact
    def __call__(self, x, train: bool = True):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        norm = lambda v: nn.BatchNorm(use_running_average=not train, momentum=0.9)(v)
        feat = lrelu(nn.Conv(self.nf, (3, 3), padding="SAME")(x))
        feat = lrelu(norm(nn.Conv(self.nf, (4, 4), strides=2, padding=((1, 1), (1, 1)), use_bias=False)(feat)))
        mult = 2
        for _ in range(self.stages - 1):
            f = self.nf * min(mult, 8)
            feat = lrelu(norm(nn.Conv(f, (3, 3), padding="SAME", use_bias=False)(feat)))
            feat = lrelu(norm(nn.Conv(f, (4, 4), strides=2, padding=((1, 1), (1, 1)), use_bias=False)(feat)))
            mult *= 2
        return feat


@ARCH_REGISTRY.register()
class Discriminator_VGG_296(nn.Module):
    """Patch-296 discriminator (reference :108-165)."""
    in_nc: int = 3
    nf: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        feat = _VGGDownStack(self.nf, 5)(x, train)
        feat = feat.reshape(feat.shape[0], -1)
        feat = nn.leaky_relu(nn.Dense(100)(feat), 0.2)
        return nn.Dense(1)(feat)


@ARCH_REGISTRY.register()
class Ranker_VGG12_296(nn.Module):
    """Frozen perceptual Ranker (reference ranksrgan_arch.py:168-227): VGG12
    stack (all convs WITH bias, unlike the discriminator) + global average
    pool + Linear(512,100)-lrelu-Linear(100,1) head.  Module names mirror the
    reference keys so checkpoints port via convert_ranker."""
    in_nc: int = 3
    nf: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        norm = lambda v, name: nn.BatchNorm(use_running_average=not train,
                                            momentum=0.9, name=name)(v)
        feat = lrelu(nn.Conv(self.nf, (3, 3), padding="SAME", name="conv0_0")(x))
        feat = lrelu(norm(nn.Conv(self.nf, (4, 4), strides=2, padding=((1, 1), (1, 1)),
                                  name="conv0_1")(feat), "bn0_1"))
        mult = 2
        for k in range(1, 5):
            f = self.nf * min(mult, 8)
            feat = lrelu(norm(nn.Conv(f, (3, 3), padding="SAME",
                                      name=f"conv{k}_0")(feat), f"bn{k}_0"))
            feat = lrelu(norm(nn.Conv(f, (4, 4), strides=2, padding=((1, 1), (1, 1)),
                                      name=f"conv{k}_1")(feat), f"bn{k}_1"))
            mult *= 2
        feat = feat.mean(axis=(1, 2))  # AvgPool2d(full) + flatten
        feat = nn.leaky_relu(nn.Dense(100, name="linear1")(feat), 0.2)
        return nn.Dense(1, name="linear2")(feat)
