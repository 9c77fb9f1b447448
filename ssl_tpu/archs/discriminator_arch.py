"""Discriminators (reference: archs/discriminator_arch.py).

- VGGStyleDiscriminator (input 128/192 variants) — ESRGAN-SSL's D
- UNetDiscriminatorSN — RealESRGAN-SSL's D (U-Net + spectral norm + skips)

Stateful pieces (BN running stats, spectral-norm power iterates) live in the
'batch_stats' collection; train steps thread it as a mutable collection."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.archs.arch_util import resize_nearest
from ssl_tpu.utils.registry import ARCH_REGISTRY


def _bilinear_resize(x, scale):
    import jax
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, int(h * scale), int(w * scale), c), method="bilinear")


@ARCH_REGISTRY.register()
class VGGStyleDiscriminator(nn.Module):
    """VGG-style D with BN and stride-2 halving down to 4x4 (reference
    discriminator_arch.py:113-191). input_size must be 128 or 192."""
    num_in_ch: int = 3
    num_feat: int = 64
    input_size: int = 128

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.input_size in (128, 192), f"input size must be 128 or 192, got {self.input_size}"
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        norm = lambda v: nn.BatchNorm(use_running_average=not train, momentum=0.9)(v)

        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME")(x))
        feat = lrelu(norm(nn.Conv(self.num_feat, (4, 4), strides=2, padding=((1, 1), (1, 1)), use_bias=False)(feat)))
        mult = 2
        for _ in range(4):  # 128->64->32->16->8->4 over the stride-2 convs
            f = self.num_feat * min(mult, 8)
            feat = lrelu(norm(nn.Conv(f, (3, 3), padding="SAME", use_bias=False)(feat)))
            feat = lrelu(norm(nn.Conv(f, (4, 4), strides=2, padding=((1, 1), (1, 1)), use_bias=False)(feat)))
            mult *= 2
        if self.input_size == 192:
            feat = lrelu(norm(nn.Conv(self.num_feat * 8, (3, 3), padding="SAME", use_bias=False)(feat)))
            feat = lrelu(norm(nn.Conv(self.num_feat * 8, (4, 4), strides=2, padding=((1, 1), (1, 1)), use_bias=False)(feat)))
        feat = feat.reshape(feat.shape[0], -1)
        feat = lrelu(nn.Dense(100)(feat))
        return nn.Dense(1)(feat)


class _SNConv(nn.Module):
    """Spectral-normalized conv (power-iteration state in batch_stats).

    Padding is the torch convention ((k-1)//2 both sides) — flax 'SAME'
    differs for even kernels on odd inputs (e.g. the reference's own
    25x25 UNetDiscriminatorSNv1 demo).

    ``dtype`` = compute/activation dtype (params + SN power iterates stay
    fp32): bf16 halves the D's activation HBM traffic on TPU."""
    features: int
    kernel: tuple = (3, 3)
    strides: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        p = (self.kernel[0] - 1) // 2
        conv = nn.Conv(self.features, self.kernel, strides=self.strides,
                       padding=((p, p), (p, p)), use_bias=self.use_bias,
                       dtype=self.dtype)
        return nn.SpectralNorm(conv)(x, update_stats=update_stats)


@ARCH_REGISTRY.register()
class UNetDiscriminatorSN(nn.Module):
    """U-Net discriminator with spectral norm and skip connections
    (reference discriminator_arch.py:326-385). Returns a per-pixel logit map.

    ``compute_dtype``: 'bfloat16' runs the conv/lrelu/resize pipeline in bf16
    (params, SN power iterates and the returned logits stay fp32) — config
    key ``network_d: {compute_dtype: bfloat16}``.  The D bucket is
    bandwidth-bound on TPU (see BASELINE.md MFU table), so halving activation
    bytes is the lever; the logit map is cast back to fp32 before the loss."""
    num_in_ch: int = 3
    num_feat: int = 64
    skip_connection: bool = True
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        us = train
        if dt is not None:
            x = x.astype(dt)
        x0 = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv0", dtype=dt)(x))
        x1 = lrelu(_SNConv(self.num_feat * 2, (4, 4), 2, use_bias=False, name="conv1", dtype=dt)(x0, us))
        x2 = lrelu(_SNConv(self.num_feat * 4, (4, 4), 2, use_bias=False, name="conv2", dtype=dt)(x1, us))
        x3 = lrelu(_SNConv(self.num_feat * 8, (4, 4), 2, use_bias=False, name="conv3", dtype=dt)(x2, us))
        # upsample
        x3u = _bilinear_resize(x3, 2)
        x4 = lrelu(_SNConv(self.num_feat * 4, (3, 3), 1, use_bias=False, name="conv4", dtype=dt)(x3u, us))
        if self.skip_connection:
            x4 = x4 + x2
        x4u = _bilinear_resize(x4, 2)
        x5 = lrelu(_SNConv(self.num_feat * 2, (3, 3), 1, use_bias=False, name="conv5", dtype=dt)(x4u, us))
        if self.skip_connection:
            x5 = x5 + x1
        x5u = _bilinear_resize(x5, 2)
        x6 = lrelu(_SNConv(self.num_feat, (3, 3), 1, use_bias=False, name="conv6", dtype=dt)(x5u, us))
        if self.skip_connection:
            x6 = x6 + x0
        out = lrelu(_SNConv(self.num_feat, (3, 3), 1, use_bias=False, name="conv7", dtype=dt)(x6, us))
        out = lrelu(_SNConv(self.num_feat, (3, 3), 1, use_bias=False, name="conv8", dtype=dt)(out, us))
        out = nn.Conv(1, (3, 3), padding="SAME", name="conv9", dtype=dt)(out)
        return out.astype(jnp.float32) if dt is not None else out


@ARCH_REGISTRY.register()
class UNetDiscriminatorSNv1(nn.Module):
    """Shallow (1-level) U-Net SN discriminator (reference :388-425)."""
    num_in_ch: int = 3
    num_feat: int = 64
    skip_connection: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        x0 = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME", name="conv0")(x))
        x1 = lrelu(_SNConv(self.num_feat * 2, (4, 4), 2, use_bias=False, name="conv1")(x0, train))
        import jax
        x1 = jax.image.resize(x1, (x1.shape[0], x0.shape[1], x0.shape[2], x1.shape[3]),
                              method="bilinear")
        x2 = lrelu(_SNConv(self.num_feat, (3, 3), 1, use_bias=False, name="conv2")(x1, train))
        if self.skip_connection:
            x2 = x2 + x0
        out = lrelu(_SNConv(self.num_feat, (3, 3), 1, use_bias=False, name="conv3")(x2, train))
        return nn.Conv(1, (3, 3), padding="SAME", name="conv4")(out)


@ARCH_REGISTRY.register()
class MOD(nn.Module):
    """Mixture-of-discriminators with hard expert routing (reference :39-110).

    Faithful layout: 7-conv BN feature extractor; softmax routing over
    feature @ w_gating1; CodeReduction = Linear(c -> c*E) + lrelu, times a
    learned (1,1,c*E) OrthorTransform weight, + lrelu; the per-expert
    classifier weights are SHARED (the reference appends the same module E
    times); hard routing picks the argmax expert per pixel.
    Returns (logits, routing, parts, ortho_weight) like the reference."""
    num_in_ch: int = 3
    num_feat: int = 64
    num_expert: int = 12

    @nn.compact
    def __call__(self, x, train: bool = True):
        import jax
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        norm = lambda v, i: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, name=f"fe_bn{i}")(v)
        nf = self.num_feat
        f = lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="fe_conv0")(x))
        f = lrelu(norm(nn.Conv(nf, (4, 4), strides=2, padding=((1, 1), (1, 1)),
                               use_bias=False, name="fe_conv1")(f), 1))
        f = lrelu(norm(nn.Conv(nf * 2, (3, 3), padding="SAME", use_bias=False,
                               name="fe_conv2")(f), 2))
        f = lrelu(norm(nn.Conv(nf * 2, (4, 4), strides=2, padding=((1, 1), (1, 1)),
                               use_bias=False, name="fe_conv3")(f), 3))
        for i in range(3):
            f = lrelu(norm(nn.Conv(nf * 4, (3, 3), padding="SAME", use_bias=False,
                                   name=f"fe_conv{4 + i}")(f), 4 + i))
        b, h, w, c = f.shape
        feature = f.reshape(b, h * w, c)
        w_gate = self.param("w_gating1", nn.initializers.normal(1.0),
                            (c, self.num_expert))
        routing = jax.nn.softmax(feature @ w_gate, axis=-1)       # (b, hw, E)
        # CodeReduction (reference :22-35)
        body = lrelu(nn.Dense(c * self.num_expert, name="cr_body")(feature))
        w_trans = self.param("cr_weight", nn.initializers.normal(1.0),
                             (1, 1, c * self.num_expert))
        proj = lrelu(body * w_trans)
        parts = jnp.split(proj, self.num_expert, axis=-1)
        top = jnp.argmax(routing, axis=-1)                        # (b, hw)
        # SHARED classifier applied to each expert's slice
        fc1 = nn.Dense(self.num_feat // 2, name="cls_fc1")
        fc2 = nn.Dense(1, name="cls_fc2")
        outs = [fc2(nn.leaky_relu(fc1(p), 0.2)) for p in parts]   # E x (b,hw,1)
        stacked = jnp.stack(outs, axis=-1)                        # (b, hw, 1, E)
        output = jnp.take_along_axis(stacked, top[..., None, None], axis=-1)[..., 0]
        ortho_weight = w_trans.reshape(self.num_expert, -1)
        return output, routing, parts, ortho_weight


@ARCH_REGISTRY.register()
class Discriminator_VGG_192(nn.Module):
    """192-input VGG-style D (reference :194-255) — layer-for-layer identical
    to VGGStyleDiscriminator(input_size=192); shares its scope so the param
    tree (and the vgg_style converter) stay flat."""
    num_in_ch: int = 3
    num_feat: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        sub = VGGStyleDiscriminator(self.num_in_ch, self.num_feat, 192)
        nn.share_scope(self, sub)
        return sub(x, train)


@ARCH_REGISTRY.register()
class DiscriminatorSN_VGG_192(nn.Module):
    """Spectral-norm VGG D for 192 inputs (reference :258-323): conv0_0
    biased, all SN convs bias-free."""
    num_in_ch: int = 3
    num_feat: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        feat = lrelu(nn.Conv(self.num_feat, (3, 3), padding="SAME")(x))
        feat = lrelu(_SNConv(self.num_feat, (4, 4), 2, use_bias=False)(feat, train))
        mult = 2
        for _ in range(4):
            f = self.num_feat * min(mult, 8)
            feat = lrelu(_SNConv(f, (3, 3), 1, use_bias=False)(feat, train))
            feat = lrelu(_SNConv(f, (4, 4), 2, use_bias=False)(feat, train))
            mult *= 2
        feat = lrelu(_SNConv(self.num_feat * 8, (3, 3), 1, use_bias=False)(feat, train))
        feat = lrelu(_SNConv(self.num_feat * 8, (4, 4), 2, use_bias=False)(feat, train))
        feat = feat.reshape(feat.shape[0], -1)
        feat = lrelu(nn.Dense(100)(feat))
        return nn.Dense(1)(feat)


@ARCH_REGISTRY.register()
class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (taming/pix2pix layout; the reference's CFW /
    autoencoder adversarial loss uses it via LPIPSWithDiscriminator,
    ldm/modules/losses/contperceptual.py:22).  BN variant, stride-2 pyramid,
    1-channel logit map."""
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        norm = lambda v: nn.BatchNorm(use_running_average=not train,
                                      momentum=0.9)(v)
        h = lrelu(nn.Conv(self.ndf, (4, 4), strides=2,
                          padding=((1, 1), (1, 1)), name="conv0")(x))
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            h = lrelu(norm(nn.Conv(self.ndf * mult, (4, 4), strides=2,
                                   padding=((1, 1), (1, 1)), use_bias=False,
                                   name=f"conv{n}")(h)))
        mult = min(2 ** self.n_layers, 8)
        h = lrelu(norm(nn.Conv(self.ndf * mult, (4, 4), strides=1,
                               padding=((1, 1), (1, 1)), use_bias=False,
                               name=f"conv{self.n_layers}")(h)))
        return nn.Conv(1, (4, 4), strides=1, padding=((1, 1), (1, 1)),
                       name="conv_out")(h)
