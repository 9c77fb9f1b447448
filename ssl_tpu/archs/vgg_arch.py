"""VGG feature extractor for perceptual loss (reference: archs/vgg_arch.py:55-161).

Named-layer taps ('conv1_1'...'conv5_4', relu/pool variants), ImageNet input
normalization, optional [-1,1]->[0,1] range_norm.  Weights can be loaded from a
torchvision-format ``vgg19`` state_dict (.pth, CPU torch available in-image)
via ``load_vgg_weights_from_torch`` — there is no network egress here, so the
extractor falls back to fixed-seed random weights when no file is given (fine
for tests; provide ``VGG19_NPZ``/``vgg_path`` for metric-grade runs)."""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def vgg19_layer_names():
    names = []
    block, idx = 1, 1
    for v in VGG19_CFG:
        if v == "M":
            names.append(f"pool{block}")
            block += 1
            idx = 1
        else:
            names.append(f"conv{block}_{idx}")
            names.append(f"relu{block}_{idx}")
            idx += 1
    return names


from ssl_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register()  # reference registers it too (GAN-Based-SR vgg_arch.py:52)
class VGGFeatureExtractor(nn.Module):
    """Runs VGG19 until the deepest requested layer, returning a dict of taps.

    layer_name_list entries like 'conv5_4' tap BEFORE the relu (reference
    behavior when the option comments say "before relu").

    ``compute_dtype``: 'bfloat16' runs the conv/relu/pool tower in bf16
    activations — params stay fp32 (identical tree) and every returned tap
    is cast back to fp32, so the loss math downstream is unchanged in dtype.
    Same bandwidth-motivated contract as the D/G ``compute_dtype`` knobs
    (BASELINE.md MFU table); precision pinned by
    tests/test_archs.py::test_vgg_bf16_deviation."""
    layer_name_list: Sequence[str] = ("conv5_4",)
    use_input_norm: bool = True
    range_norm: bool = False
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x):
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            mean = jnp.array([0.485, 0.456, 0.406])
            std = jnp.array([0.229, 0.224, 0.225])
            x = (x - mean) / std
        if dt is not None:
            x = x.astype(dt)

        wanted = set(self.layer_name_list)
        # find deepest needed position
        names = vgg19_layer_names()
        last = max(names.index(n) for n in wanted)
        out = {}
        block, idx = 1, 1
        pos = 0
        for v in VGG19_CFG:
            if pos > last:
                break
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if f"pool{block}" in wanted:
                    out[f"pool{block}"] = x
                pos += 1
                block += 1
                idx = 1
            else:
                x = nn.Conv(v, (3, 3), padding="SAME", dtype=dt,
                            name=f"conv{block}_{idx}")(x)
                if f"conv{block}_{idx}" in wanted:
                    out[f"conv{block}_{idx}"] = x
                pos += 1
                if pos > last:
                    break
                x = nn.relu(x)
                if f"relu{block}_{idx}" in wanted:
                    out[f"relu{block}_{idx}"] = x
                pos += 1
                idx += 1
        if dt is not None:
            out = {k: v.astype(jnp.float32) for k, v in out.items()}
        return out


def load_vgg_weights_from_torch(pth_path: str):
    """Convert torchvision vgg19 'features.*' conv weights to this module's
    flax param tree. OIHW -> HWIO."""
    import torch
    sd = torch.load(pth_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = {}
    block, idx = 1, 1
    conv_i = 0
    for v in VGG19_CFG:
        if v == "M":
            block += 1
            idx = 1
            conv_i += 1  # pool layer in features sequence
        else:
            wk, bk = f"features.{conv_i}.weight", f"features.{conv_i}.bias"
            if wk in sd:
                w = np.asarray(sd[wk].numpy()).transpose(2, 3, 1, 0)
                b = np.asarray(sd[bk].numpy())
                params[f"conv{block}_{idx}"] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
            conv_i += 2  # conv + relu
            idx += 1
    return {"params": params}


def init_vgg_variables(layer_name_list, rng_seed: int = 0, vgg_path: str | None = None):
    """Build variables for VGGFeatureExtractor: from .pth if available else random."""
    model = VGGFeatureExtractor(layer_name_list=tuple(layer_name_list))
    vgg_path = vgg_path or os.environ.get("VGG19_NPZ") or os.environ.get("VGG19_PTH")
    variables = jax.jit(model.init)(jax.random.PRNGKey(rng_seed), jnp.zeros((1, 32, 32, 3)))
    if vgg_path and os.path.exists(vgg_path):
        loaded = load_vgg_weights_from_torch(vgg_path)
        params = dict(variables["params"])
        for k, v in loaded["params"].items():
            if k in params:
                params[k] = v
        variables = {"params": params}
    return model, variables
