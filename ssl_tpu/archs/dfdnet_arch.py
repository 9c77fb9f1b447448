"""DFDNet — deep face dictionary network.

Full-fidelity NHWC flax rewrite of the diffusion-tree vendored
basicsr/archs/dfdnet_arch.py + dfdnet_util.py: VGG19-face feature taps,
facial-component dictionary feature swapping (AdaIN + similarity argmax +
attention), multi-scale dilation block, SFT upsampling decoder.  The facial
part dictionary ships as external data — `load_dfdnet_dict` converts the
reference torch dict file to NHWC jax arrays; `part_locations` are concrete
host integers (the reference likewise only supports batch-1 testing with
per-image boxes; each distinct box set implies a retrace under jit)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from ssl_tpu.archs.vgg_arch import VGGFeatureExtractor
from ssl_tpu.archs.basicvsr_arch import interp_bilinear
from ssl_tpu.utils.registry import ARCH_REGISTRY

_PARTS = ("left_eye", "right_eye", "nose", "mouth")
_FEATURE_SIZES = (256, 128, 64, 32)
_CHANNEL_SIZES = (128, 256, 512, 512)
_VGG_LAYERS = ("relu2_2", "relu3_4", "relu4_4", "conv5_4")


def load_dfdnet_dict(path: str):
    """torch facial-component dict {f_size: {part: (N,c,s,s)}} -> NHWC jax."""
    import torch
    d = torch.load(path, map_location="cpu")
    out = {}
    for k, parts in d.items():
        out[str(k)] = {p: jnp.asarray(np.asarray(v).transpose(0, 2, 3, 1))
                       for p, v in parts.items()}
    return out


class _SNConv(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        pad = (self.kernel[0] - 1) // 2 * self.dilation
        conv = nn.Conv(self.features, self.kernel,
                       kernel_dilation=(self.dilation, self.dilation),
                       padding=((pad, pad), (pad, pad)), use_bias=self.use_bias)
        return nn.SpectralNorm(conv)(x, update_stats=update_stats)


def _blur(x):
    """Fixed [1,2,1] outer-product 3x3 depthwise blur (dfdnet_util.py:41-54)."""
    k = jnp.asarray([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]]) / 16.0
    c = x.shape[-1]
    kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    return lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)], feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _adain(content, style, eps=1e-5):
    """adaptive_instance_normalization (dfdnet_util.py:74-88); var is the
    torch default UNBIASED variance over the flattened spatial dims."""
    def stats(f):
        flat = f.reshape(f.shape[0], -1, f.shape[-1])
        mean = flat.mean(axis=1)
        var = flat.var(axis=1, ddof=1) + eps
        return mean[:, None, None, :], jnp.sqrt(var)[:, None, None, :]

    c_mean, c_std = stats(content)
    s_mean, s_std = stats(style)
    return (content - c_mean) / c_std * s_std + s_mean


class _AttentionBlock(nn.Module):
    """SNconv-lrelu-SNconv (dfdnet_util.py:91-94)."""
    channels: int

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        y = _SNConv(self.channels, name="conv0")(x, update_stats)
        y = nn.leaky_relu(y, 0.2)
        return _SNConv(self.channels, name="conv1")(y, update_stats)


class _MSDilationBlock(nn.Module):
    """Multi-scale dilation block (dfdnet_util.py:123-147)."""
    channels: int
    dilation: tuple = (4, 3, 2, 1)

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        outs = []
        for i in range(4):
            y = _SNConv(self.channels, dilation=self.dilation[i],
                        name=f"block{i}_conv0")(x, update_stats)
            y = nn.leaky_relu(y, 0.2)
            y = _SNConv(self.channels, dilation=self.dilation[i],
                        name=f"block{i}_conv1")(y, update_stats)
            outs.append(y)
        y = jnp.concatenate(outs, axis=-1)
        return _SNConv(self.channels, name="fusion")(y, update_stats) + x


class _SFTUpBlock(nn.Module):
    """Blur + SNconv + SFT modulation + bilinear-up SNconv (dfdnet_arch.py:12-53)."""
    out_channel: int

    @nn.compact
    def __call__(self, x, updated_feat, update_stats: bool = False):
        out = _SNConv(self.out_channel, name="conv1")(_blur(x), update_stats)
        out = nn.leaky_relu(out, 0.04)  # two stacked 0.2-lrelus in the official code
        scale = _SNConv(self.out_channel, name="scale0")(updated_feat, update_stats)
        scale = _SNConv(self.out_channel, name="scale1")(
            nn.leaky_relu(scale, 0.2), update_stats)
        shift = _SNConv(self.out_channel, name="shift0")(updated_feat, update_stats)
        shift = jax.nn.sigmoid(_SNConv(self.out_channel, name="shift1")(
            nn.leaky_relu(shift, 0.2), update_stats))
        out = out * scale + shift
        out = interp_bilinear(out, (out.shape[1] * 2, out.shape[2] * 2),
                              align_corners=False)
        out = _SNConv(self.out_channel, name="convup")(out, update_stats)
        return nn.leaky_relu(out, 0.2)


@ARCH_REGISTRY.register()
class DFDNet(nn.Module):
    """DFDNet (reference dfdnet_arch.py:57-169).  512x512 faces; batch 1.

    __call__(x, part_locations, dicts): x (1,512,512,3) in [-1,1];
    part_locations: sequence of 4 int boxes (x0,y0,x1,y1) at 512-scale;
    dicts: {f_size(str): {part: (N,s,s,c)}} from load_dfdnet_dict."""
    num_feat: int = 64

    @nn.compact
    def __call__(self, x, part_locations, dicts, update_stats: bool = False):
        nf = self.num_feat
        vgg_features = VGGFeatureExtractor(
            layer_name_list=_VGG_LAYERS, use_input_norm=True, range_norm=True,
            name="vgg_extractor")(x)

        updated_vgg_features = []
        for li, (vgg_layer, f_size) in enumerate(zip(_VGG_LAYERS, _FEATURE_SIZES)):
            dict_features = dicts[str(f_size)]
            vgg_feat = vgg_features[vgg_layer]
            updated_feat = vgg_feat
            for part_idx, part_name in enumerate(_PARTS):
                loc = (np.asarray(part_locations[part_idx]).reshape(-1)[:4]
                       // (512 / f_size)).astype(int)
                x0, y0, x1, y1 = int(loc[0]), int(loc[1]), int(loc[2]), int(loc[3])
                dict_feat = dict_features[part_name]          # (N,s,s,c)
                part_feat = vgg_feat[:, y0:y1, x0:x1]
                ph, pw = part_feat.shape[1], part_feat.shape[2]
                ds = dict_feat.shape[1]
                part_resized = interp_bilinear(part_feat, (ds, ds),
                                               align_corners=False)
                dfeat = _adain(dict_feat, part_resized)
                # similarity: VALID conv of the part patch with each dict
                # element as a filter -> (N,) scores
                sim = jnp.einsum("bhwc,nhwc->n", part_resized, dfeat)
                sel = jnp.argmax(jax.nn.softmax(sim.reshape(-1)))
                chosen = jnp.take(dfeat, sel, axis=0)[None]   # (1,s,s,c)
                # F.interpolate default mode: NEAREST (dfdnet_arch.py:118)
                iy = jnp.floor(jnp.arange(ph) * (ds / ph)).astype(jnp.int32)
                ix = jnp.floor(jnp.arange(pw) * (ds / pw)).astype(jnp.int32)
                swap = chosen[:, iy][:, :, ix]
                attn = _AttentionBlock(
                    _CHANNEL_SIZES[li],
                    name=f"attn_{part_name}_{f_size}")(swap - part_feat,
                                                       update_stats)
                updated_feat = lax.dynamic_update_slice(
                    updated_feat, attn * swap + part_feat, (0, y0, x0, 0))
            updated_vgg_features.append(updated_feat)

        feat = _MSDilationBlock(nf * 8, name="msd")(
            vgg_features["conv5_4"], update_stats)
        feat = _SFTUpBlock(nf * 8, name="upsample0")(feat, updated_vgg_features[3],
                                                     update_stats)
        feat = _SFTUpBlock(nf * 4, name="upsample1")(feat, updated_vgg_features[2],
                                                     update_stats)
        feat = _SFTUpBlock(nf * 2, name="upsample2")(feat, updated_vgg_features[1],
                                                     update_stats)
        feat = _SFTUpBlock(nf, name="upsample3")(feat, updated_vgg_features[0],
                                                 update_stats)
        out = nn.leaky_relu(_SNConv(nf, name="up4_conv0")(feat, update_stats), 0.2)
        for r in range(2):
            body = nn.Conv(nf, (3, 3), padding="SAME",
                           name=f"up4_res{r}_conv0")(out)
            body = nn.Conv(nf, (3, 3), padding="SAME",
                           name=f"up4_res{r}_conv1")(nn.leaky_relu(body, 0.2))
            out = out + body
        out = nn.Conv(3, (3, 3), padding="SAME", name="up4_last")(out)
        return jnp.tanh(out)
