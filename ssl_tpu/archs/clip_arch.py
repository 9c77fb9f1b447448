"""CLIP RN50 — image/text towers for CLIPIQA (TPU-native flax).

Reference parity: the GAN tree's vendored CLIP (scripts/metrics/clip/model.py:
ModifiedResNet + text Transformer; clipiqa_pyiqa/clip_model.py resizes the
attention-pool positional embedding for non-224 inputs).  NHWC flax
re-implementation of the public CLIP architecture: 3-conv stem with avgpool,
Bottleneck layers whose stride-2 is an avgpool before the last 1x1
(anti-aliased downsample), attention pooling head, and a pre-LN causal text
transformer.  Weights load from OpenAI-CLIP-layout .pth via
utils.weight_port.convert_clip_rn50 (zero-egress: user-supplied).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Bottleneck(nn.Module):
    """CLIP ModifiedResNet bottleneck: 1x1 -> 3x3 -> (avgpool if stride) -> 1x1,
    all BN; downsample branch = avgpool + 1x1 conv + BN."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, name=name)
        out = nn.relu(bn("bn1")(nn.Conv(self.planes, (1, 1), use_bias=False,
                                        name="conv1")(x)))
        out = nn.relu(bn("bn2")(nn.Conv(self.planes, (3, 3), padding="SAME",
                                        use_bias=False, name="conv2")(out)))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride),
                              strides=(self.stride, self.stride))
        out = bn("bn3")(nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                                name="conv3")(out))
        if self.stride > 1 or x.shape[-1] != self.planes * 4:
            sc = x
            if self.stride > 1:
                sc = nn.avg_pool(sc, (self.stride, self.stride),
                                 strides=(self.stride, self.stride))
            sc = bn("downsample_bn")(nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                                             name="downsample_conv")(sc))
        else:
            sc = x
        return nn.relu(out + sc)


class AttentionPool2d(nn.Module):
    """CLIP attention pooling: mean-token query over the flattened feature
    map.  ``use_pos`` mirrors the vendored clip_model.py's ``pos_embedding``
    flag (clipiqa_pyiqa/clip_model.py:221-227): False (CLIPIQA's default —
    clipiqa_arch.py:101 ``pos_embedding=False``) adds NO positional
    embedding, which is what makes arbitrary input sizes work; True resizes
    the whole (tokens, C) embedding matrix with 2-D torch bicubic to
    (HW+1, C) — since C is unchanged that is an exact 1-D bicubic along the
    token axis (including the cls row, faithfully odd as the reference)."""
    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int = 7

    @nn.compact
    def __call__(self, x, use_pos: bool = False):
        from ssl_tpu.ops.torch_resize import interp_bicubic
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        seq = jnp.concatenate([seq.mean(axis=1, keepdims=True), seq], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c ** -0.5),
                         (self.spacial_dim ** 2 + 1, c))
        if use_pos:
            if h * w != self.spacial_dim ** 2:
                pos = interp_bicubic(pos[None, :, :, None],
                                     (h * w + 1, c))[0, :, :, 0]
            seq = seq + pos[None]
        q = nn.Dense(c, name="q_proj")(seq[:, :1])
        k = nn.Dense(c, name="k_proj")(seq)
        v = nn.Dense(c, name="v_proj")(seq)
        hd = c // self.num_heads
        q = q.reshape(b, 1, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q * hd ** -0.5, k), -1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
        return nn.Dense(self.output_dim, name="c_proj")(out)


class ModifiedResNet(nn.Module):
    """CLIP RN50 visual tower (width 64, layers (3,4,6,3), embed 1024)."""
    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    heads: int = 32
    attn_spacial_dim: int = 7  # input_resolution // 32

    @nn.compact
    def __call__(self, x, train: bool = False, use_pos: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, name=name)
        # 3-conv stem, stride 2 then avgpool
        x = nn.relu(bn("bn1")(nn.Conv(self.width // 2, (3, 3), strides=2,
                                      padding=1, use_bias=False, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Conv(self.width // 2, (3, 3), padding=1,
                                      use_bias=False, name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Conv(self.width, (3, 3), padding=1,
                                      use_bias=False, name="conv3")(x)))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        for i, blocks in enumerate(self.layers):
            planes = self.width * 2 ** i
            for j in range(blocks):
                stride = 2 if (j == 0 and i > 0) else 1
                x = Bottleneck(planes, stride, name=f"layer{i+1}_{j}")(x, train)
        return AttentionPool2d(self.width * 32, self.heads, self.output_dim,
                               spacial_dim=self.attn_spacial_dim,
                               name="attnpool")(x, use_pos=use_pos)


class _TextBlock(nn.Module):
    width: int
    heads: int
    # OpenAI CLIP (vendored clip/model.py) uses QuickGELU; open_clip's
    # ViT-H text tower (the reference's FrozenOpenCLIPEmbedder source)
    # uses exact nn.GELU
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, x, mask):
        b, n, c = x.shape
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(c * 3, name="in_proj")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.heads
        rs = lambda t: t.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", rs(q) * hd ** -0.5, rs(k)) + mask
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, rs(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, n, c)
        x = x + nn.Dense(c, name="out_proj")(o)
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(c * 4, name="c_fc")(y)
        if self.act == "quick_gelu":
            y = y * jax.nn.sigmoid(1.702 * y)
        else:
            y = jax.nn.gelu(y, approximate=False)
        return x + nn.Dense(c, name="c_proj")(y)


class CLIPTextEncoder(nn.Module):
    """CLIP text tower.  __call__ takes token ids; encode_embeddings takes
    precomputed token embeddings (CLIPIQA's learned PromptLearner path, which
    bypasses the tokenizer entirely — no BPE vocab needed)."""
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 1024
    act: str = "quick_gelu"  # 'gelu' for open_clip towers (ViT-H)

    def setup(self):
        self.token_embedding = nn.Embed(self.vocab_size, self.width,
                                        name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width))
        self.blocks = [_TextBlock(self.width, self.heads, act=self.act,
                                  name=f"resblock_{i}")
                       for i in range(self.layers)]
        self.ln_final = nn.LayerNorm(epsilon=1e-5, name="ln_final")
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim))

    def _run(self, x, eot_idx):
        n = x.shape[1]
        mask = jnp.triu(jnp.full((n, n), -jnp.inf), k=1)[None, None]
        x = x + self.positional_embedding[None, :n]
        for blk in self.blocks:
            x = blk(x, mask)
        x = self.ln_final(x)
        pooled = jnp.take_along_axis(x, eot_idx[:, None, None].astype(jnp.int32), 1)[:, 0]
        return pooled @ self.text_projection

    def __call__(self, token_ids):
        x = self.token_embedding(token_ids)
        eot = jnp.argmax(token_ids, axis=-1)  # eot token has the highest id
        return self._run(x, eot)

    def encode_embeddings(self, embeds, eot_idx):
        return self._run(embeds, eot_idx)

    def hidden_states(self, token_ids, penultimate: bool = True):
        """(b, 77, width) token hidden states — StableSR's conditioning uses
        the penultimate layer of the frozen (Open)CLIP text tower
        (FrozenOpenCLIPEmbedder, layer='penultimate')."""
        x = self.token_embedding(token_ids)
        n = x.shape[1]
        mask = jnp.triu(jnp.full((n, n), -jnp.inf), k=1)[None, None]
        x = x + self.positional_embedding[None, :n]
        upto = len(self.blocks) - 1 if penultimate else len(self.blocks)
        for blk in self.blocks[:upto]:
            x = blk(x, mask)
        return self.ln_final(x)


class CLIPVisionTransformer(nn.Module):
    """OpenAI-CLIP ViT visual tower returning EVERY resblock hidden state
    (the reference modified its vendored clip/model.py:227-263 to return
    ``(x0..x11, final)`` so ClipLoss can tap multi-layer features).

    NHWC input (normalized); per-block states come back NLD ``(b, tokens, c)``
    (the reference keeps torch's LND — identical numbers, transposed), the
    last element is the projected ``(b, output_dim)`` embedding."""
    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=self.patch_size, padding="VALID", use_bias=False,
                    name="conv1")(x)
        x = x.reshape(b, -1, self.width)       # row-major tokens == torch
        cls = self.param("class_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)).astype(x.dtype), x], 1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         ((self.input_resolution // self.patch_size) ** 2 + 1,
                          self.width))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        feats = []
        for i in range(self.layers):
            x = _TextBlock(self.width, self.heads, act=self.act,
                           name=f"resblock_{i}")(x, 0.0)
            feats.append(x)
        pooled = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.output_dim))
        return tuple(feats) + (pooled @ proj,)
