"""VGG-feature self-similarity perceptual loss (reference parity:
Diffusion-Based-SR/basicsr/losses/basic_loss.py:272-612 PerceptualSimLoss).

The reference computes self-similarity Gram structures over VGG feature maps
(spatial area-area and channel-channel variants, optionally tiled) and
penalizes their mismatch between SR and GT — on top of the usual perceptual
and style terms.  TPU-native jnp: everything is dense batched matmul, no
unfold materialization beyond the (tile, token) layout XLA fuses away.

Layout note: the feature-similarity helpers take NCHW (the reference's
layout; simself_strategies.py shares this convention for its oracle suite).
The loss class transposes the NHWC flax VGG taps before calling them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssl_tpu.losses.simself_strategies import _area_tokens, _tiles, _unfold, _untile
from ssl_tpu.utils.registry import LOSS_REGISTRY


def _l2_normalize(q):
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)


def featsim_areaarea(img, is_shift=False, shift_h=4, shift_w=4, dh=32, dw=32,
                     kernel_size=5, softmax=True, rearrange_back=True,
                     crossentropy=False, temperature=0, cos_distance=False):
    """Spatial self-similarity of a feature map (reference
    basic_loss.py:489-548 ``simself_areaarea``).  ``dh == 0 or dw == 0``
    selects the GLOBAL path (every position against every position);
    otherwise positions compare within (dh, dw) tiles.  ``kernel_size > 0``
    augments each token with its zero-padded k x k neighborhood."""
    b, c, h, w = img.shape
    x = jnp.roll(img, (-shift_h, -shift_w), (2, 3)) if is_shift else img
    if dh == 0 or dw == 0:
        if kernel_size > 0:
            q = _unfold(x, kernel_size, padding=kernel_size // 2)  # b, c·k², hw
        else:
            q = x.reshape(b, c, h * w)
        q = q.transpose(0, 2, 1)                                    # b, hw, f
        if cos_distance:
            q = _l2_normalize(q)
        s = jnp.einsum("bnf,bmf->bnm", q, q)                        # b, hw, hw
        if temperature != 0:
            s = s / temperature
        if softmax:
            s = jax.nn.softmax(s, axis=-1)
        if crossentropy:
            return s.reshape(b * h * w, h * w)
        if rearrange_back:
            s = s.reshape(b, h * w, h, w)
            if is_shift:
                s = jnp.roll(s, (shift_h, shift_w), (2, 3))
        return s
    if kernel_size > 0:
        q = _area_tokens(x, dh, dw, kernel_size)                    # b,H,W,T,c,k²
        bb, H, W, t, cc, kk = q.shape
        q = q.reshape(bb, H, W, t, cc * kk)
    else:
        # the reference keeps the tile grid FLATTENED here ((b, hw, t, c),
        # basic_loss.py:532-534) — mirrored exactly, including the fact that
        # rearrange_back then cannot apply (the reference's 5-D einops
        # pattern errors on the 4-D tensor, basic_loss.py:545)
        q = _tiles(x, dh, dw)                                       # b,H,W,t,c
        bb, H, W, t, cc = q.shape
        q = q.reshape(bb, H * W, t, cc)
    if cos_distance:
        q = _l2_normalize(q)
    s = jnp.einsum("...tf,...uf->...tu", q, q)
    if temperature != 0:
        s = s / temperature
    if softmax:
        s = jax.nn.softmax(s, axis=-1)
    if crossentropy:
        return s.reshape(bb * H * W * t, t)
    if rearrange_back:
        if kernel_size <= 0:
            raise ValueError(
                "rearrange_back with kernel_size=0 tiles: the flattened "
                "(b, hw, t, t) map has no 5-D tile layout (the reference "
                "errors here too, basic_loss.py:545); use crossentropy or "
                "rearrange_back=False")
        s = _untile(s, dh, dw)                                      # b,C,H·dh,W·dw
        if is_shift:
            s = jnp.roll(s, (shift_h, shift_w), (2, 3))
    return s


def _unfold_lastdim(q, k):
    """torch .unfold(dimension=-1, step=1, size=k): stack sliding windows of
    the last axis into a trailing size-k axis."""
    n = q.shape[-1] - k + 1
    return jnp.stack([q[..., i:i + n] for i in range(k)], axis=-1) \
        .reshape(q.shape[:-1] + (n, k))


def featsim_channelchannel(img, is_shift=False, shift_c=4, dc=32,
                           kernel_size=5, softmax=True, crossentropy=False,
                           temperature=0, cos_distance=False):
    """Channel self-similarity of a feature map (reference
    basic_loss.py:550-596 ``simself_channelchannel``).  ``dc == 0`` compares
    every channel against every channel; otherwise channels compare within
    size-dc groups.  ``kernel_size > 0`` augments each channel's token with
    reflect-padded neighboring channels."""
    b, c, h, w = img.shape
    x = jnp.roll(img, -shift_c, 1) if is_shift else img
    if dc == 0:
        if kernel_size > 0:
            q = x.transpose(0, 2, 3, 1)                             # b,h,w,c
            q = jnp.pad(q, ((0, 0),) * 3 + ((kernel_size // 2,) * 2,),
                        mode="reflect")
            q = _unfold_lastdim(q, kernel_size)                     # b,h,w,c,k
            q = q.transpose(0, 3, 1, 2, 4).reshape(b, c, h * w * kernel_size)
        else:
            q = x.reshape(b, c, h * w)
        if cos_distance:
            q = _l2_normalize(q)
        s = jnp.einsum("bcf,bdf->bcd", q, q)                        # b,c,c
        if temperature != 0:
            s = s / temperature
        if softmax:
            s = jax.nn.softmax(s, axis=-1)
        if crossentropy:
            s = s.reshape(b * c, c)
        return s
    C = c // dc
    q = x.reshape(b, C, dc, h * w).transpose(0, 1, 3, 2)            # b,C,hw,dc
    if kernel_size > 0:
        q = jnp.pad(q, ((0, 0),) * 3 + ((kernel_size // 2,) * 2,),
                    mode="reflect")
        q = _unfold_lastdim(q, kernel_size)                         # b,C,hw,dc,k
        q = q.transpose(0, 1, 3, 2, 4).reshape(b, C, dc, h * w * kernel_size)
    else:
        q = q.transpose(0, 1, 3, 2)                                 # b,C,dc,hw
    if cos_distance:
        q = _l2_normalize(q)
    s = jnp.einsum("bcdf,bcef->bcde", q, q)                         # b,C,dc,dc
    if temperature != 0:
        s = s / temperature
    if softmax:
        s = jax.nn.softmax(s, axis=-1)
    if crossentropy:
        s = s.reshape(b * C * dc, dc)
    return s


def _soft_cross_entropy(logits, target):
    """torch CrossEntropyLoss with probability targets (soft-label mode,
    reduction 'mean' over rows): -(target * log_softmax(logits)).sum(-1)."""
    return jnp.mean(jnp.sum(-target * jax.nn.log_softmax(logits, axis=-1),
                            axis=-1))


def _gram(x_nchw):
    n, c, h, w = x_nchw.shape
    f = x_nchw.reshape(n, c, h * w)
    return jnp.einsum("bcn,bdn->bcd", f, f) / (c * h * w)


@LOSS_REGISTRY.register()
class PerceptualSimLoss:
    """Perceptual + style + feature-self-similarity loss (reference
    basic_loss.py:272-481).  Returns the reference's quadruple
    ``(percep, style, simself, simself_channel)`` — each None when its
    weight is 0.

    The per-layer simself terms use ``featsim_areaarea`` /
    ``featsim_channelchannel`` with the per-layer dh/dw/dc/kernel lists;
    layers whose ``simself_layer_weights`` entry is 0 are skipped (the
    reference iterates dict order of layer_weights = insertion order).

    Fidelity notes: the reference's style branch reads the nonexistent
    ``self.criterion_type`` (AttributeError whenever ``style_weight > 0``);
    we use the perceptual/style criterion there.  The GT feature tower is
    stop-gradiented like the reference's ``gt.detach()``."""

    def __init__(self, layer_weights, vgg_type="vgg19", use_input_norm=True,
                 range_norm=False, perceptual_weight=1.0, style_weight=0.0,
                 criterion_perceptual_style="l1",
                 simself_weight=0.0, simself_layer_weights=(0, 0, 1, 1, 1),
                 criterion_simself="l1",
                 feat_simself_dh_list=(0, 0, 16, 16, 0),
                 feat_simself_dw_list=(0, 0, 16, 16, 0),
                 feat_kernel_size_list=(0, 0, 0, 0, 0),
                 cos_distance=False, temperature=0, softmax_sr=True,
                 softmax_gt=True, rearrange_back=True, crossentropy=False,
                 simself_channel_weight=0.0,
                 simself_channel_layer_wights=(0, 0, 1, 1, 1),
                 criterion_simself_channel="l1",
                 feat_simself_dc_list=(0, 0, 16, 16, 16),
                 feat_channel_kernel_size_list=(0, 0, 0, 0, 0),
                 vgg_path=None):
        assert vgg_type.startswith("vgg19"), \
            "only vgg19 is wired up (reference default)"
        if criterion_perceptual_style not in ("l1", "l2", "fro"):
            raise NotImplementedError(
                f"{criterion_perceptual_style} criterion has not been supported.")
        for crit in (criterion_simself, criterion_simself_channel):
            if crit not in ("l1", "crossentropy"):
                raise NotImplementedError(
                    f"{crit} criterion has not been supported.")
        self.layer_weights = dict(layer_weights)
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion_perceptual_style = criterion_perceptual_style
        self.simself_weight = simself_weight
        self.simself_layer_weights = tuple(simself_layer_weights)
        self.criterion_simself = criterion_simself
        self.feat_simself_dh_list = tuple(feat_simself_dh_list)
        self.feat_simself_dw_list = tuple(feat_simself_dw_list)
        self.feat_kernel_size_list = tuple(feat_kernel_size_list)
        self.cos_distance = cos_distance
        self.temperature = temperature
        self.softmax_sr = softmax_sr
        self.softmax_gt = softmax_gt
        self.rearrange_back = rearrange_back
        self.crossentropy = crossentropy
        self.simself_channel_weight = simself_channel_weight
        self.simself_channel_layer_wights = tuple(simself_channel_layer_wights)
        self.criterion_simself_channel = criterion_simself_channel
        self.feat_simself_dc_list = tuple(feat_simself_dc_list)
        self.feat_channel_kernel_size_list = tuple(feat_channel_kernel_size_list)
        from ssl_tpu.archs.vgg_arch import VGGFeatureExtractor, init_vgg_variables
        _, self.variables = init_vgg_variables(list(self.layer_weights),
                                               vgg_path=vgg_path)
        self.model = VGGFeatureExtractor(
            layer_name_list=tuple(self.layer_weights),
            use_input_norm=use_input_norm, range_norm=range_norm)

    def _dist(self, a, b):
        if self.criterion_perceptual_style == "l1":
            return jnp.mean(jnp.abs(a - b))
        if self.criterion_perceptual_style == "l2":
            return jnp.mean((a - b) ** 2)
        return jnp.linalg.norm((a - b).reshape(-1))

    def _sim_dist(self, a, b, criterion):
        if criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        return _soft_cross_entropy(a, b)

    def __call__(self, x, gt):
        """x, gt: NHWC in [0,1] (range_norm maps [-1,1] like the reference).
        Returns (percep, style, simself, simself_channel)."""
        fx = self.model.apply(self.variables, x)
        fgt = jax.lax.stop_gradient(self.model.apply(self.variables, gt))
        keys = list(self.layer_weights)

        percep = style = None
        if self.perceptual_weight > 0:
            percep = 0.0
            for k in keys:
                percep += self._dist(fx[k], fgt[k]) * self.layer_weights[k]
            percep *= self.perceptual_weight
        if self.style_weight > 0:
            style = 0.0
            for k in keys:
                a = _gram(fx[k].transpose(0, 3, 1, 2))
                bm = _gram(fgt[k].transpose(0, 3, 1, 2))
                style += self._dist(a, bm) * self.layer_weights[k]
            style *= self.style_weight

        simself = None
        if self.simself_weight > 0:
            simself = 0.0
            for idx, k in enumerate(keys):
                if self.simself_layer_weights[idx] <= 0:
                    continue
                kw = dict(is_shift=False, shift_h=4, shift_w=4,
                          dh=self.feat_simself_dh_list[idx],
                          dw=self.feat_simself_dw_list[idx],
                          kernel_size=self.feat_kernel_size_list[idx],
                          rearrange_back=self.rearrange_back,
                          crossentropy=self.crossentropy,
                          temperature=self.temperature,
                          cos_distance=self.cos_distance)
                sx = featsim_areaarea(fx[k].transpose(0, 3, 1, 2),
                                      softmax=self.softmax_sr, **kw)
                sg = featsim_areaarea(fgt[k].transpose(0, 3, 1, 2),
                                      softmax=self.softmax_gt, **kw)
                simself += self._sim_dist(sx, sg, self.criterion_simself) \
                    * self.simself_layer_weights[idx]
            simself *= self.simself_weight

        simself_channel = None
        if self.simself_channel_weight > 0:
            simself_channel = 0.0
            for idx, k in enumerate(keys):
                if self.simself_channel_layer_wights[idx] <= 0:
                    continue
                kw = dict(is_shift=False, shift_c=4,
                          dc=self.feat_simself_dc_list[idx],
                          kernel_size=self.feat_channel_kernel_size_list[idx],
                          crossentropy=self.crossentropy,
                          temperature=self.temperature,
                          cos_distance=self.cos_distance)
                sx = featsim_channelchannel(fx[k].transpose(0, 3, 1, 2),
                                            softmax=self.softmax_sr, **kw)
                sg = featsim_channelchannel(fgt[k].transpose(0, 3, 1, 2),
                                            softmax=self.softmax_gt, **kw)
                simself_channel += self._sim_dist(
                    sx, sg, self.criterion_simself_channel) \
                    * self.simself_channel_layer_wights[idx]
            simself_channel *= self.simself_channel_weight

        return percep, style, simself, simself_channel


@LOSS_REGISTRY.register()
class ClipLoss:
    """CLIP-visual-feature perceptual loss (reference
    basic_loss.py:706-830): bicubic-resize to 224, CLIP-normalize, run the
    ViT visual tower, and penalize per-resblock feature distances (l1/l2/fro)
    at ``feature_choose`` indices with ``layer_weights`` — optionally on
    self-similarity Grams of the token features instead
    (``self_similarity``: 'no' | 'similarity_featfeat_nopatch' |
    'similarity_featfeat_nopatch_final').

    Fidelity notes: the reference computes the whole forward under
    ``torch.no_grad()`` — the loss carries NO gradient; mirrored with
    ``stop_gradient`` (set ``stop_gradient=False`` to make it trainable,
    a deliberate beyond-reference knob).  Its style branch calls
    ``_gram_mat`` on 3-D token features, which raises in the reference
    itself — ``style_weight > 0`` raises here with that note.  The CLIP
    checkpoint is user-supplied (zero egress): without
    ``pretrain_clipmodel_path`` the tower runs at fixed-seed random weights
    (fine for tests; matches the VGG fallback policy)."""

    def __init__(self, pretrain_clipmodel_path=None, perceptual_weight=0.1,
                 style_weight=0.0, criterion="l1", input_norm=True,
                 mean=(0.48145466, 0.4578275, 0.40821073),
                 std=(0.26862954, 0.26130258, 0.27577711),
                 layer_weights=(0.1, 0.1, 1, 1, 1),
                 feature_choose=(0, 2, 5, 8, 11),
                 self_similarity="no", stop_gradient=True, vit_config=None):
        import os

        import jax as _jax

        from ssl_tpu.archs.clip_arch import CLIPVisionTransformer

        if criterion not in ("l1", "l2", "fro"):
            raise NotImplementedError(
                f"{criterion} criterion has not been supported.")
        if style_weight > 0:
            raise NotImplementedError(
                "ClipLoss style_weight: the reference's _gram_mat expects "
                "4-D maps and raises on the ViT's 3-D token features "
                "(basic_loss.py:803) — unsupported there too.")
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion = criterion
        self.input_norm = input_norm
        self.mean = jnp.asarray(mean, jnp.float32)
        self.std = jnp.asarray(std, jnp.float32)
        self.layer_weights = tuple(layer_weights)
        self.feature_choose = tuple(feature_choose)
        self.self_similarity = self_similarity
        self.stop_gradient = stop_gradient

        cfg = dict(vit_config or {})
        path = pretrain_clipmodel_path
        loaded = None
        if path and os.path.exists(str(path)):
            from ssl_tpu.utils.weight_port import convert_clip_vit, load_torch_state_dict
            sd = load_torch_state_dict(str(path), param_key="state_dict")
            loaded, meta = convert_clip_vit(sd)
            cfg = {**meta, **cfg}
        elif path:
            raise FileNotFoundError(
                f"ClipLoss: pretrain_clipmodel_path {path!r} does not exist "
                "(weights are user-supplied in this zero-egress build)")
        self.model = CLIPVisionTransformer(**cfg)
        if loaded is not None:
            self.variables = {"params": loaded}
        else:
            self.variables = _jax.jit(self.model.init)(
                _jax.random.PRNGKey(0),
                jnp.zeros((1, self.model.input_resolution,
                           self.model.input_resolution, 3)))

    def _dist(self, a, b):
        if self.criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        if self.criterion == "l2":
            return jnp.mean((a - b) ** 2)
        return jnp.linalg.norm((a - b).reshape(-1))

    @staticmethod
    def _sim_nopatch(feat):
        """(b, k, c) token features -> (b, k, k) self-similarity with a
        softmax over ALL k*k entries jointly (reference
        similarity_featfeat_nopatch, basic_loss.py:825-834; LND there —
        same numbers)."""
        b, k, _ = feat.shape
        s = jnp.einsum("bkc,blc->bkl", feat, feat)
        s = jax.nn.softmax(s.reshape(b, k * k), axis=-1)
        return s.reshape(b, k, k)

    @staticmethod
    def _sim_final(feat):
        """(b, k) final embedding -> (b, 1, 1) squared-norm
        (reference similarity_final_feat)."""
        x = feat[:, None, :]
        return jnp.einsum("bik,bjk->bij", x, x)

    def __call__(self, x, gt):
        """x, gt: NHWC in [0,1].  Returns (percep_loss, style_loss) like the
        reference (style always None — see class docstring)."""
        r = self.model.input_resolution
        if x.shape[1] != r or x.shape[2] != r:
            from ssl_tpu.ops.torch_resize import interp_bicubic
            x = interp_bicubic(x, (r, r))
            gt = interp_bicubic(gt, (r, r))
        if self.input_norm:
            x = (x - self.mean) / self.std
            gt = (gt - self.mean) / self.std
        fx = self.model.apply(self.variables, x)
        fgt = self.model.apply(self.variables, jax.lax.stop_gradient(gt))
        if self.stop_gradient:
            fx = jax.lax.stop_gradient(fx)
        percep = None
        if self.perceptual_weight > 0:
            percep = 0.0
            for i, idx in enumerate(self.feature_choose):
                a, b = fx[idx], fgt[idx]
                if self.criterion == "fro":
                    d = jnp.linalg.norm((a - b).reshape(-1))
                elif self.self_similarity == "no":
                    d = self._dist(a, b)
                elif self.self_similarity == "similarity_featfeat_nopatch":
                    d = self._dist(self._sim_nopatch(a), self._sim_nopatch(b))
                elif self.self_similarity == "similarity_featfeat_nopatch_final":
                    if a.ndim != 2:
                        d = self._dist(self._sim_nopatch(a), self._sim_nopatch(b))
                    else:
                        d = self._dist(self._sim_final(a), self._sim_final(b))
                else:
                    raise NotImplementedError(self.self_similarity)
                percep += d * self.layer_weights[i]
            percep *= self.perceptual_weight
        return percep, None
