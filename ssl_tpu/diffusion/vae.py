"""AutoencoderKL — the latent-diffusion VAE (reference: ldm/models/autoencoder.py:291).

Encoder/Decoder with resnet blocks + mid attention, KL latent; plus the CFW
fusion decoder variant (AutoencoderKLResi, :469) that consumes encoder
features for detail re-injection at test time.  NHWC flax.

``compute_dtype``: 'bfloat16' runs the resnet/attention activations in bf16
(params fp32, norm stats fp32, encode moments / decoded image fp32 — same
precision contract as the UNet knob, see unet.py docstring).  The
differentiable decode is 68% of the diffusion-SSL step FLOPs and the step is
memory-bound (BASELINE.md), and under ``remat_blocks`` the saved
block-boundary activations halve too.  Pinned by
tests/test_diffusion.py::test_diffusion_bf16_deviation."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _num_groups(c: int) -> int:
    if c % 32 == 0:
        return 32
    import math
    return math.gcd(c, 32) or 1


def _gn(x, name=None, dt=None):
    return nn.GroupNorm(num_groups=_num_groups(x.shape[-1]), epsilon=1e-6,
                        name=name, dtype=dt)(x)


def _nonlin(x):
    return x * jax.nn.sigmoid(x)  # swish


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME",
                    dtype=dt)(_nonlin(_gn(x, dt=dt)))
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME",
                    dtype=dt)(_nonlin(_gn(h, dt=dt)))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=dt)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head mid-block attention (model.py:154).  Runs at the latent
    resolution (4096 tokens for a 512^2 input) — ``use_flash_attention``
    keeps the 4096^2 logits out of HBM via the Pallas TPU kernel."""
    use_flash_attention: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from ssl_tpu.ops.attention import sdp_attention
        dt = self.dtype
        b, h, w, c = x.shape
        y = _gn(x, dt=dt)
        q = nn.Conv(c, (1, 1), name="q", dtype=dt)(y).reshape(b, h * w, 1, c)
        k = nn.Conv(c, (1, 1), name="k", dtype=dt)(y).reshape(b, h * w, 1, c)
        v = nn.Conv(c, (1, 1), name="v", dtype=dt)(y).reshape(b, h * w, 1, c)
        out = sdp_attention(q, k, v, c ** -0.5,
                            self.use_flash_attention).reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1), name="proj_out", dtype=dt)(out)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    use_flash_attention: bool = False
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, return_fea: bool = False):
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        to32 = (lambda v: v.astype(jnp.float32)) if dt is not None else (lambda v: v)
        feas = []
        h = nn.Conv(self.ch, (3, 3), padding="SAME", name="conv_in", dtype=dt)(x)
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * mult, dt, name=f"down_{i}_block_{j}")(h)
            if i in (1, 2):
                feas.append(to32(h))
            if i != len(self.ch_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), strides=2,
                            padding=((0, 1), (0, 1)), name=f"down_{i}_downsample",
                            dtype=dt)(h)
        h = ResnetBlock(h.shape[-1], dt, name="mid_block_1")(h)
        h = AttnBlock(self.use_flash_attention, dt, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dt, name="mid_block_2")(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        h = nn.Conv(out_ch, (3, 3), padding="SAME", name="conv_out",
                    dtype=dt)(_nonlin(_gn(h, "norm_out", dt)))
        h = to32(h)
        if return_fea:
            return h, feas
        return h


class Decoder(nn.Module):
    """``remat_blocks`` (default on) wraps every res/attn block in
    ``nn.remat`` so a differentiable decode stores only block-boundary
    activations and replays one block at a time in the backward — without it,
    a whole-decoder ``jax.checkpoint`` replay must keep the FULL decoder
    forward live at once, which exceeds one v5e's HBM at 512² training
    shapes (the reference trains StableSR at 512² — configs/SSL/base.yaml).
    Exact math; forward-only sampling is untouched (remat only alters
    differentiation).

    ``remat_skip_lowres = k`` exempts the ResnetBlocks of the k
    LOWEST-resolution stages (stage 0 = mid + the first up level at latent
    resolution, stage 1 = 2x, ...) from remat: their backward replay is pure
    extra FLOPs while their activations are small (latent-res saves are
    4^stages cheaper than the full-res ones that actually pressure HBM) —
    a replay-FLOP/memory trade for the 512^2 diffusion-SSL step where the
    frozen-decoder dgrad chain is 2/3 of step FLOPs.  The mid AttnBlock
    always stays remat'd (saving its seq^2 softmax would cost more HBM than
    every ResnetBlock boundary combined).  Exact math either way."""
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    use_flash_attention: bool = False
    remat_blocks: bool = True
    remat_skip_lowres: int = 0
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, z):
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        RB = nn.remat(ResnetBlock) if self.remat_blocks else ResnetBlock
        AB = nn.remat(AttnBlock) if self.remat_blocks else AttnBlock
        L = len(self.ch_mult)

        def _rb(stage):  # stage = resolution doublings above the latent
            if self.remat_blocks and stage >= self.remat_skip_lowres:
                return RB
            return ResnetBlock
        mult = self.ch_mult[-1]
        h = nn.Conv(self.ch * mult, (3, 3), padding="SAME", name="conv_in",
                    dtype=dt)(z)
        h = _rb(0)(h.shape[-1], dt, name="mid_block_1")(h)
        h = AB(self.use_flash_attention, dt, name="mid_attn")(h)
        h = _rb(0)(h.shape[-1], dt, name="mid_block_2")(h)
        for i in reversed(range(L)):
            for j in range(self.num_res_blocks + 1):
                h = _rb(L - 1 - i)(self.ch * self.ch_mult[i], dt,
                                   name=f"up_{i}_block_{j}")(h)
            if i != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = nn.Conv(c, (3, 3), padding="SAME", name=f"up_{i}_upsample",
                            dtype=dt)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv_out",
                    dtype=dt)(_nonlin(_gn(h, "norm_out", dt)))
        return h.astype(jnp.float32) if dt is not None else h


class FuseSftBlockRRDB(nn.Module):
    """Fuse_sft_block_RRDB (reference ldm/modules/diffusionmodules/model.py:822):
    ``dec + w * ResBlock(RRDB^n(ResBlock(cat(enc, dec))))``.  The two
    bracketing ResBlocks are the VAE-style GN/swish/conv blocks (model.py:797
    ResBlock, identical math to ResnetBlock here, skip 1x1 when channels
    change); the trunk is ``num_block`` ESRGAN RRDBs (gc 32)."""
    out_ch: int
    num_block: int = 2
    num_grow_ch: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, enc_feat, dec_feat, w: float = 1.0):
        from ssl_tpu.archs.rrdbnet_arch import RRDB
        dt = self.dtype
        h = ResnetBlock(self.out_ch, dt, name="encode_enc_1")(
            jnp.concatenate([enc_feat.astype(dec_feat.dtype), dec_feat], axis=-1))
        for k in range(self.num_block):
            h = RRDB(self.out_ch, self.num_grow_ch, dtype=dt,
                     name=f"encode_enc_2_{k}")(h)
        h = ResnetBlock(self.out_ch, dt, name="encode_enc_3")(h)
        return dec_feat + w * h


class DecoderResi(nn.Module):
    """CFW fusion decoder — STRUCTURALLY the reference Decoder_Mix
    (ldm/modules/diffusionmodules/model.py:677): at every intermediate level
    (i != 0, i != top) the LQ-encoder feature enc_feas[i-1] is fused into the
    decode stream through a Fuse_sft_block_RRDB before the upsample
    (model.py:778-785); real StableSR CFW checkpoints import losslessly via
    convert_ldm_vae."""
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    fusion_w: float = 1.0
    num_fuse_block: int = 2
    use_flash_attention: bool = False
    remat_blocks: bool = True   # same memory contract as Decoder.remat_blocks
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, z, enc_feas):
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        RB = nn.remat(ResnetBlock) if self.remat_blocks else ResnetBlock
        AB = nn.remat(AttnBlock) if self.remat_blocks else AttnBlock
        FB = nn.remat(FuseSftBlockRRDB) if self.remat_blocks else FuseSftBlockRRDB
        mult = self.ch_mult[-1]
        h = nn.Conv(self.ch * mult, (3, 3), padding="SAME", name="conv_in",
                    dtype=dt)(z)
        h = RB(h.shape[-1], dt, name="mid_block_1")(h)
        h = AB(self.use_flash_attention, dt, name="mid_attn")(h)
        h = RB(h.shape[-1], dt, name="mid_block_2")(h)
        for i in reversed(range(len(self.ch_mult))):
            for j in range(self.num_res_blocks + 1):
                h = RB(self.ch * self.ch_mult[i], dt, name=f"up_{i}_block_{j}")(h)
            if i != 0 and i != len(self.ch_mult) - 1:
                h = FB(self.ch * self.ch_mult[i],
                       self.num_fuse_block, dtype=dt,
                       name=f"fusion_layer_{i}")(
                    enc_feas[i - 1], h, self.fusion_w)
            if i != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
                h = nn.Conv(c, (3, 3), padding="SAME", name=f"up_{i}_upsample",
                            dtype=dt)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv_out",
                    dtype=dt)(_nonlin(_gn(h, "norm_out", dt)))
        return h.astype(jnp.float32) if dt is not None else h


class AutoencoderKLResi(nn.Module):
    """VAE whose encode also returns intermediate features, decoded with CFW
    fusion (reference autoencoder.py:469)."""
    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    fusion_w: float = 1.0
    num_fuse_block: int = 2
    use_flash_attention: bool = False
    remat_decoder_blocks: bool = True
    compute_dtype: str | None = None

    def setup(self):
        self.encoder = Encoder(self.ch, self.ch_mult, self.num_res_blocks,
                               z_channels=self.embed_dim,
                               use_flash_attention=self.use_flash_attention,
                               compute_dtype=self.compute_dtype)
        self.decoder = DecoderResi(self.ch, self.ch_mult, self.num_res_blocks,
                                   fusion_w=self.fusion_w,
                                   num_fuse_block=self.num_fuse_block,
                                   use_flash_attention=self.use_flash_attention,
                                   remat_blocks=self.remat_decoder_blocks,
                                   compute_dtype=self.compute_dtype)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1))
        self.post_quant_conv = nn.Conv(self.embed_dim, (1, 1))

    def encode(self, x):
        moments, feas = self.encoder(x, return_fea=True)
        moments = self.quant_conv(moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0), feas

    def decode(self, z, enc_feas):
        return self.decoder(self.post_quant_conv(z), enc_feas)

    def __call__(self, x, z=None):
        mean, logvar, feas = self.encode(x)
        latent = mean if z is None else z
        return self.decode(latent, feas), mean, logvar


class AutoencoderKL(nn.Module):
    """KL VAE with quant convs; encode returns (mean, logvar)."""
    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    use_flash_attention: bool = False
    remat_decoder_blocks: bool = True
    remat_skip_lowres: int = 0   # see Decoder.remat_skip_lowres
    compute_dtype: str | None = None

    def setup(self):
        self.encoder = Encoder(self.ch, self.ch_mult, self.num_res_blocks,
                               z_channels=self.embed_dim,
                               use_flash_attention=self.use_flash_attention,
                               compute_dtype=self.compute_dtype)
        self.decoder = Decoder(self.ch, self.ch_mult, self.num_res_blocks,
                               use_flash_attention=self.use_flash_attention,
                               remat_blocks=self.remat_decoder_blocks,
                               remat_skip_lowres=self.remat_skip_lowres,
                               compute_dtype=self.compute_dtype)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1))
        self.post_quant_conv = nn.Conv(self.embed_dim, (1, 1))

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample_posterior: bool = True):
        mean, logvar = self.encode(x)
        if sample_posterior and rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        else:
            z = mean
        return self.decode(z), mean, logvar
