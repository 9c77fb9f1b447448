"""StyleGAN2 generator + discriminator — full-fidelity NHWC flax rewrite of
the diffusion-tree vendored basicsr/archs/stylegan2_arch.py on top of the
TPU-native N3/N4 ops (ops/stylegan_ops.py: fused_leaky_relu, upfirdn2d).
BasicSR inheritance, not on the SSL path; weight converters in
utils/weight_port.py, oracle-parity tests in tests/test_reference_parity_zoo.py
(the reference runs on its own upfirdn2d CPU fallback + the loader's native
fused_act)."""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from ssl_tpu.ops.stylegan_ops import fused_leaky_relu, make_resample_kernel, upfirdn2d
from ssl_tpu.utils.registry import ARCH_REGISTRY


def _norm_style_code(x):
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=1, keepdims=True) + 1e-8)


def _upfirdn_up(x, kernel, factor=2):
    """UpFirDnUpsample (stylegan2_arch.py:43-66)."""
    k = make_resample_kernel(kernel) * (factor ** 2)
    pad = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), up=factor, down=1,
                     pad=((pad + 1) // 2 + factor - 1, pad // 2))


def _upfirdn_smooth(x, kernel, upsample_factor=1, downsample_factor=1,
                    kernel_size=1):
    """UpFirDnSmooth (stylegan2_arch.py:97-127)."""
    k = make_resample_kernel(kernel)
    if upsample_factor > 1:
        k = k * (upsample_factor ** 2)
        pad = (k.shape[0] - upsample_factor) - (kernel_size - 1)
        p = ((pad + 1) // 2 + upsample_factor - 1, pad // 2 + 1)
    elif downsample_factor > 1:
        pad = (k.shape[0] - downsample_factor) + (kernel_size - 1)
        p = ((pad + 1) // 2, pad // 2)
    else:
        raise NotImplementedError
    return upfirdn2d(x, jnp.asarray(k), up=1, down=1, pad=p)


class EqualLinear(nn.Module):
    """Equalized linear (stylegan2_arch.py:134-179).  kernel stored (in,out);
    runtime scale (1/sqrt(in))*lr_mul, bias scaled by lr_mul."""
    out_features: int
    use_bias: bool = True
    bias_init_val: float = 0.0
    lr_mul: float = 1.0
    activation: str | None = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        scale = (1.0 / math.sqrt(in_features)) * self.lr_mul
        kernel = self.param(
            "kernel", lambda key, shape: jax.random.normal(key, shape) / self.lr_mul,
            (in_features, self.out_features))
        bias = (self.param("bias", nn.initializers.constant(self.bias_init_val),
                           (self.out_features,)) * self.lr_mul
                if self.use_bias else None)
        out = x @ (kernel * scale)
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(out, bias)
        if bias is not None:
            out = out + bias
        return out


def _per_sample_conv(x, w, stride=1, padding=0):
    """Grouped-by-batch conv: x (b,h,w,cin), w (b,k,k,cin,cout)."""
    def one(xi, wi):
        return lax.conv_general_dilated(
            xi[None], wi, (stride, stride), [(padding, padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return jax.vmap(one)(x, w)


def _per_sample_conv_transpose2(x, w):
    """torch F.conv_transpose2d(stride=2, padding=0) per batch sample.
    x (b,h,w,cin), w (b,k,k,cin,cout) — equivalent correlation: dilate input
    by 2, pad k-1, spatially-flipped kernel."""
    k = w.shape[1]

    def one(xi, wi):
        wi_f = jnp.flip(wi, (0, 1))
        return lax.conv_general_dilated(
            xi[None], wi_f, (1, 1), [(k - 1, k - 1)] * 2,
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    return jax.vmap(one)(x, w)


class ModulatedConv2d(nn.Module):
    """Style-modulated conv (stylegan2_arch.py:182-285), no bias.

    interpolation_mode 'fir' = the upfirdn resampling of stylegan2_arch.py;
    'bilinear'/'nearest' = the pre-interpolate + plain conv variant of
    stylegan2_bilinear_arch.py:73-160 (same param layout)."""
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: str | None = None
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    eps: float = 1e-8
    interpolation_mode: str = "fir"

    @nn.compact
    def __call__(self, x, style):
        from ssl_tpu.archs.basicvsr_arch import interp_bilinear
        b, h, w, cin = x.shape
        k = self.kernel_size
        scale = 1.0 / math.sqrt(cin * k * k)
        style = EqualLinear(cin, bias_init_val=1.0, name="modulation")(style)
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, cin, self.out_channels))
        wmod = scale * weight[None] * style[:, None, None, :, None]  # (b,k,k,ci,co)
        if self.demodulate:
            demod = jax.lax.rsqrt(jnp.sum(wmod * wmod, axis=(1, 2, 3)) + self.eps)
            wmod = wmod * demod[:, None, None, None, :]

        if self.interpolation_mode != "fir":
            if self.sample_mode == "upsample":
                x = interp_bilinear(x, (h * 2, w * 2), align_corners=False)
            elif self.sample_mode == "downsample":
                x = interp_bilinear(x, (h // 2, w // 2), align_corners=False)
            return _per_sample_conv(x, wmod, stride=1, padding=k // 2)
        if self.sample_mode == "upsample":
            out = _per_sample_conv_transpose2(x, wmod)
            out = _upfirdn_smooth(out, self.resample_kernel, 2, 1, k)
        elif self.sample_mode == "downsample":
            x = _upfirdn_smooth(x, self.resample_kernel, 1, 2, k)
            out = _per_sample_conv(x, wmod, stride=2, padding=0)
        else:
            out = _per_sample_conv(x, wmod, stride=1, padding=k // 2)
        return out


class StyleConv(nn.Module):
    """Modulated conv + noise injection + fused-lrelu (stylegan2_arch.py:288-333)."""
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: str | None = None
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    interpolation_mode: str = "fir"

    @nn.compact
    def __call__(self, x, style, noise=None):
        out = ModulatedConv2d(self.out_channels, self.kernel_size,
                              self.num_style_feat, self.demodulate,
                              self.sample_mode, self.resample_kernel,
                              interpolation_mode=self.interpolation_mode,
                              name="modulated_conv")(x, style)
        noise_weight = self.param("noise_weight", nn.initializers.zeros, (1,))
        if noise is None:
            noise = jax.random.normal(self.make_rng("noise"),
                                      (out.shape[0], out.shape[1], out.shape[2], 1))
        out = out + noise_weight * noise
        bias = self.param("activate_bias", nn.initializers.zeros,
                          (self.out_channels,))
        return fused_leaky_relu(out, bias)


class ToRGB(nn.Module):
    """Feature -> RGB with optional skip upsample (stylegan2_arch.py:336-374)."""
    num_style_feat: int
    upsample: bool = True
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    interpolation_mode: str = "fir"

    @nn.compact
    def __call__(self, x, style, skip=None):
        from ssl_tpu.archs.basicvsr_arch import interp_bilinear
        out = ModulatedConv2d(3, 1, self.num_style_feat, demodulate=False,
                              name="modulated_conv")(x, style)
        out = out + self.param("bias", nn.initializers.zeros, (3,))
        if skip is not None:
            if self.upsample:
                if self.interpolation_mode == "fir":
                    skip = _upfirdn_up(skip, self.resample_kernel, 2)
                else:
                    skip = interp_bilinear(
                        skip, (skip.shape[1] * 2, skip.shape[2] * 2),
                        align_corners=False)
            out = out + skip
        return out


_SG2_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128,
                 256: 64, 512: 32, 1024: 16}


def _sg2_channels(channel_multiplier, narrow):
    return {res: int(base * (channel_multiplier if res >= 64 else 1) * narrow)
            if res >= 64 else int(base * narrow)
            for res, base in _SG2_CHANNELS.items()}


@ARCH_REGISTRY.register()
class StyleGAN2Generator(nn.Module):
    """StyleGAN2 generator (stylegan2_arch.py:394-586).

    __call__(styles, ...) with styles a list of (b, num_style_feat) codes.
    Noise: pass `noise` (list), or `randomize_noise=False` to use the stored
    per-layer noise params (checkpoint-importable), or `randomize_noise=True`
    with an rng under the 'noise' collection."""
    out_size: int
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 2
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    narrow: float = 1.0

    @property
    def log_size(self):
        return int(math.log(self.out_size, 2))

    @property
    def num_layers(self):
        return (self.log_size - 2) * 2 + 1

    @property
    def num_latent(self):
        return self.log_size * 2 - 2

    @nn.compact
    def __call__(self, styles, input_is_latent=False, noise=None,
                 randomize_noise=False, truncation=1.0, truncation_latent=None,
                 inject_index=None, return_latents=False):
        ch = _sg2_channels(self.channel_multiplier, self.narrow)
        nsf = self.num_style_feat

        # instantiate once, apply per style — a two-style mixing call must
        # SHARE the MLP params, not redeclare them (NameInUseError otherwise)
        mlp_layers = [EqualLinear(nsf, lr_mul=self.lr_mlp,
                                  activation="fused_lrelu",
                                  name=f"style_mlp_{i}")
                      for i in range(self.num_mlp)]

        def style_mlp(s):
            s = _norm_style_code(s)
            for layer in mlp_layers:
                s = layer(s)
            return s

        if not input_is_latent:
            styles = [style_mlp(s) for s in styles]
        # stored per-layer noise (reference noises.noise{i} buffers) — always
        # declared so the param tree is call-signature independent
        stored_noise = [self.param(f"noise{i}", nn.initializers.normal(1.0),
                                   (1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1))
                        for i in range(self.num_layers)]
        if noise is None:
            noise = [None] * self.num_layers if randomize_noise else stored_noise
        if truncation < 1:
            styles = [truncation_latent + truncation * (s - truncation_latent)
                      for s in styles]
        if len(styles) == 1:
            inject_index = self.num_latent
            if styles[0].ndim < 3:
                latent = jnp.repeat(styles[0][:, None], inject_index, axis=1)
            else:
                latent = styles[0]
        elif len(styles) == 2:
            if inject_index is None:
                inject_index = self.num_latent // 2
            latent1 = jnp.repeat(styles[0][:, None], inject_index, axis=1)
            latent2 = jnp.repeat(styles[1][:, None],
                                 self.num_latent - inject_index, axis=1)
            latent = jnp.concatenate([latent1, latent2], axis=1)

        const = self.param("constant_input", nn.initializers.normal(1.0),
                           (1, 4, 4, ch[4]))
        out = jnp.repeat(const, latent.shape[0], axis=0)
        out = StyleConv(ch[4], 3, nsf, name="style_conv1")(out, latent[:, 0],
                                                           noise=noise[0])
        skip = ToRGB(nsf, upsample=False, name="to_rgb1")(out, latent[:, 1])

        i = 1
        in_ch = ch[4]
        for li, res_log in enumerate(range(3, self.log_size + 1)):
            out_ch = ch[2 ** res_log]
            out = StyleConv(out_ch, 3, nsf, sample_mode="upsample",
                            resample_kernel=self.resample_kernel,
                            name=f"style_convs_{2 * li}")(out, latent[:, i],
                                                          noise=noise[2 * li + 1])
            out = StyleConv(out_ch, 3, nsf, sample_mode=None,
                            resample_kernel=self.resample_kernel,
                            name=f"style_convs_{2 * li + 1}")(out, latent[:, i + 1],
                                                              noise=noise[2 * li + 2])
            skip = ToRGB(nsf, upsample=True, resample_kernel=self.resample_kernel,
                         name=f"to_rgbs_{li}")(out, latent[:, i + 2], skip)
            i += 2
            in_ch = out_ch
        del in_ch

        if return_latents:
            return skip, latent
        return skip, None


class ScaledLeakyReLU(nn.Module):
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x):
        return nn.leaky_relu(x, self.negative_slope) * math.sqrt(2)


class EqualConv2d(nn.Module):
    """Equalized conv (stylegan2_arch.py:605-651)."""
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    bias_init_val: float = 0.0

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel_size
        scale = 1.0 / math.sqrt(cin * k * k)
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, cin, self.out_channels))
        out = lax.conv_general_dilated(
            x, weight * scale, (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            out = out + self.param("bias",
                                   nn.initializers.constant(self.bias_init_val),
                                   (self.out_channels,))
        return out


class ConvLayer(nn.Module):
    """Conv layer of the StyleGAN2 discriminator (stylegan2_arch.py:654-701)."""
    out_channels: int
    kernel_size: int
    downsample: bool = False
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            x = _upfirdn_smooth(x, self.resample_kernel, 1, 2, self.kernel_size)
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        x = EqualConv2d(self.out_channels, self.kernel_size, stride, padding,
                        use_bias=self.use_bias and not self.activate,
                        name="conv")(x)
        if self.activate:
            if self.use_bias:
                bias = self.param("activate_bias", nn.initializers.zeros,
                                  (self.out_channels,))
                x = fused_leaky_relu(x, bias)
            else:
                x = nn.leaky_relu(x, 0.2) * math.sqrt(2)
        return x


class _SG2ResBlock(nn.Module):
    out_channels: int
    resample_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        out = ConvLayer(cin, 3, name="conv1")(x)
        out = ConvLayer(self.out_channels, 3, downsample=True,
                        resample_kernel=self.resample_kernel, name="conv2")(out)
        skip = ConvLayer(self.out_channels, 1, downsample=True,
                         resample_kernel=self.resample_kernel, use_bias=False,
                         activate=False, name="skip")(x)
        return (out + skip) / math.sqrt(2)


@ARCH_REGISTRY.register()
class StyleGAN2Discriminator(nn.Module):
    """StyleGAN2 discriminator (stylegan2_arch.py:733-799)."""
    out_size: int
    channel_multiplier: int = 2
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    stddev_group: int = 4
    narrow: float = 1.0

    @nn.compact
    def __call__(self, x):
        ch = _sg2_channels(self.channel_multiplier, self.narrow)
        log_size = int(math.log(self.out_size, 2))
        out = ConvLayer(ch[self.out_size], 1, name="conv_body_0")(x)
        for bi, i in enumerate(range(log_size, 2, -1)):
            out = _SG2ResBlock(ch[2 ** (i - 1)], self.resample_kernel,
                               name=f"conv_body_{bi + 1}")(out)

        b, h, w, c = out.shape
        group = min(b, self.stddev_group)
        stddev = out.reshape(group, -1, h, w, 1, c)           # NHWC feat split
        stddev = jnp.sqrt(jnp.var(stddev, axis=0) + 1e-8)
        stddev = jnp.mean(stddev, axis=(1, 2, 3), keepdims=True)  # (g_rest,1,1,1,c)->
        stddev = jnp.mean(stddev, axis=-1, keepdims=True)[..., 0]
        stddev = jnp.tile(stddev.reshape(-1, 1, 1, 1), (group, h, w, 1))
        out = jnp.concatenate([out, stddev], axis=-1)

        out = ConvLayer(ch[4], 3, name="final_conv")(out)
        # torch flattens NCHW: (b, c*4*4) with channel-major ordering
        out = out.transpose(0, 3, 1, 2).reshape(b, -1)
        out = EqualLinear(ch[4], activation="fused_lrelu",
                          name="final_linear_0")(out)
        return EqualLinear(1, name="final_linear_1")(out)


@ARCH_REGISTRY.register()
class StyleGAN2GeneratorBilinear(nn.Module):
    """StyleGAN2 generator, bilinear-resampling variant (reference
    stylegan2_bilinear_arch.py:274-464) — identical param layout to
    StyleGAN2Generator (convert_stylegan2 covers both)."""
    out_size: int
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 2
    lr_mlp: float = 0.01
    narrow: float = 1.0
    interpolation_mode: str = "bilinear"

    @property
    def log_size(self):
        return int(math.log(self.out_size, 2))

    @property
    def num_layers(self):
        return (self.log_size - 2) * 2 + 1

    @property
    def num_latent(self):
        return self.log_size * 2 - 2

    @nn.compact
    def __call__(self, styles, input_is_latent=False, noise=None,
                 randomize_noise=False, truncation=1.0, truncation_latent=None,
                 inject_index=None, return_latents=False):
        ch = _sg2_channels(self.channel_multiplier, self.narrow)
        nsf = self.num_style_feat
        im = self.interpolation_mode

        # instantiate once, apply per style — a two-style mixing call must
        # SHARE the MLP params, not redeclare them (NameInUseError otherwise)
        mlp_layers = [EqualLinear(nsf, lr_mul=self.lr_mlp,
                                  activation="fused_lrelu",
                                  name=f"style_mlp_{i}")
                      for i in range(self.num_mlp)]

        def style_mlp(s):
            s = _norm_style_code(s)
            for layer in mlp_layers:
                s = layer(s)
            return s

        if not input_is_latent:
            styles = [style_mlp(s) for s in styles]
        stored_noise = [self.param(f"noise{i}", nn.initializers.normal(1.0),
                                   (1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1))
                        for i in range(self.num_layers)]
        if noise is None:
            noise = [None] * self.num_layers if randomize_noise else stored_noise
        if truncation < 1:
            styles = [truncation_latent + truncation * (s - truncation_latent)
                      for s in styles]
        if len(styles) == 1:
            inject_index = self.num_latent
            if styles[0].ndim < 3:
                latent = jnp.repeat(styles[0][:, None], inject_index, axis=1)
            else:
                latent = styles[0]
        elif len(styles) == 2:
            if inject_index is None:
                inject_index = self.num_latent // 2
            latent1 = jnp.repeat(styles[0][:, None], inject_index, axis=1)
            latent2 = jnp.repeat(styles[1][:, None],
                                 self.num_latent - inject_index, axis=1)
            latent = jnp.concatenate([latent1, latent2], axis=1)

        const = self.param("constant_input", nn.initializers.normal(1.0),
                           (1, 4, 4, ch[4]))
        out = jnp.repeat(const, latent.shape[0], axis=0)
        out = StyleConv(ch[4], 3, nsf, interpolation_mode=im,
                        name="style_conv1")(out, latent[:, 0], noise=noise[0])
        skip = ToRGB(nsf, upsample=False, interpolation_mode=im,
                     name="to_rgb1")(out, latent[:, 1])

        i = 1
        for li, res_log in enumerate(range(3, self.log_size + 1)):
            out_ch = ch[2 ** res_log]
            out = StyleConv(out_ch, 3, nsf, sample_mode="upsample",
                            interpolation_mode=im,
                            name=f"style_convs_{2 * li}")(out, latent[:, i],
                                                          noise=noise[2 * li + 1])
            out = StyleConv(out_ch, 3, nsf, sample_mode=None,
                            interpolation_mode=im,
                            name=f"style_convs_{2 * li + 1}")(out, latent[:, i + 1],
                                                              noise=noise[2 * li + 2])
            skip = ToRGB(nsf, upsample=True, interpolation_mode=im,
                         name=f"to_rgbs_{li}")(out, latent[:, i + 2], skip)
            i += 2

        if return_latents:
            return skip, latent
        return skip, None
