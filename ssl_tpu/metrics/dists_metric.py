"""DISTS — Deep Image Structure and Texture Similarity.

Reference parity: metrics/dists.py (uses the dists-pytorch package: VGG16
stages, per-channel learned alpha/beta weights, structure+texture terms).
Architecture + scoring implemented in flax; the pretrained VGG16 + alpha/beta
weights load from DISTS_PTH (zero-egress gate, like LPIPS)."""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.utils.registry import METRIC_REGISTRY

_VGG16_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


def l2_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Hann-window L2 pooling (DISTS_pytorch ``L2pooling``: filter_size=5 →
    effective 3×3 hanning(5)[1:-1] kernel, stride 2, pad 1, depthwise):
    ``sqrt(conv(x², w) + 1e-12)``.  The official DISTS package replaces every
    inter-stage VGG max-pool with this — plain max_pool would diverge from
    reference scores even with correctly loaded weights."""
    a = jnp.asarray([0.5, 1.0, 0.5])
    w = a[:, None] * a[None, :]
    w = w / w.sum()
    c = x.shape[-1]
    kernel = jnp.tile(w[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    out = jax.lax.conv_general_dilated(
        x * x, kernel, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return jnp.sqrt(out + 1e-12)


class VGG16Stages(nn.Module):
    """VGG16 features split into 5 stages; returns [input, s1..s5].

    Inter-stage downsampling uses DISTS-style L2 pooling (see ``l2_pool``),
    matching dists-pytorch's modified VGG, not torchvision's max-pool VGG."""

    @nn.compact
    def __call__(self, x):
        outs = [x]
        for si, (feats, n_convs) in enumerate(_VGG16_STAGES):
            if si > 0:
                x = l2_pool(x)
            for ci in range(n_convs):
                x = nn.relu(nn.Conv(feats, (3, 3), padding="SAME",
                                    name=f"s{si}_c{ci}")(x))
            outs.append(x)
        return outs


class DISTS(nn.Module):
    """Structure & texture similarity over VGG16 stages."""

    @nn.compact
    def __call__(self, x, y):
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        net = VGG16Stages(name="vgg16")
        # stage-0 features are the RAW input (DISTS_pytorch forward_once
        # returns [x, relu1_2, ...] with only the VGG path normalized)
        fx = [x] + net((x - mean) / std)[1:]
        fy = [y] + net((y - mean) / std)[1:]
        chans = [3] + [c for c, _ in _VGG16_STAGES]
        total_c = sum(chans)
        alpha = self.param("alpha", nn.initializers.constant(0.1), (total_c,))
        beta = self.param("beta", nn.initializers.constant(0.1), (total_c,))
        w_sum = jnp.sum(alpha) + jnp.sum(beta)
        c0 = c1 = 1e-6
        offset = 0
        score = 0.0
        for a, b in zip(fx, fy):
            c = a.shape[-1]
            al = alpha[offset:offset + c] / w_sum
            be = beta[offset:offset + c] / w_sum
            mu_a = a.mean(axis=(1, 2))
            mu_b = b.mean(axis=(1, 2))
            var_a = a.var(axis=(1, 2))
            var_b = b.var(axis=(1, 2))
            # centered covariance (numerically stable vs E[ab]-mu*mu)
            cov = ((a - mu_a[:, None, None]) * (b - mu_b[:, None, None])).mean(axis=(1, 2))
            texture = (2 * mu_a * mu_b + c0) / (mu_a ** 2 + mu_b ** 2 + c0)
            structure = (2 * cov + c1) / (var_a + var_b + c1)
            score = score + jnp.sum(al * texture + be * structure, axis=-1)
            offset += c
        return 1.0 - score  # distance: lower is better


_CACHE = {}


def load_dists_weights(params: dict, sd: dict, filled: set | None = None) -> dict:
    """Overlay a dists-pytorch checkpoint onto the DISTS tree.

    The official weights file carries only alpha/beta (1, 1475, 1, 1); a
    full-model save additionally carries the VGG16 convs (in forward order —
    matched positionally since shapes repeat within stages).  Populated node
    names are recorded into ``filled`` for completeness verification."""
    from ssl_tpu.utils.weight_port import _conv_w, _to_np
    if filled is None:
        filled = set()
    params = dict(params)
    for name in ("alpha", "beta"):
        if name in sd:
            params[name] = _to_np(sd[name]).reshape(-1)
            filled.add(name)
    conv_keys = [k for k, v in sd.items()
                 if k.endswith(".weight") and getattr(v, "dim", lambda: 0)() == 4
                 and tuple(v.shape[2:]) == (3, 3)]
    if conv_keys:
        order = [(si, ci) for si, (_, n) in enumerate(_VGG16_STAGES) for ci in range(n)]
        assert len(conv_keys) == len(order), \
            f"expected {len(order)} VGG16 convs, found {len(conv_keys)}"
        vgg = dict(params.get("vgg16", {}))
        for (si, ci), k in zip(order, conv_keys):
            node = {"kernel": _conv_w(sd[k])}
            bk = k[: -len("weight")] + "bias"
            if bk in sd:
                node["bias"] = _to_np(sd[bk])
            vgg[f"s{si}_c{ci}"] = node
            filled.add(f"vgg16.s{si}_c{ci}")
        params["vgg16"] = vgg
    return params


DISTS_REQUIRED_NODES = frozenset(
    ["alpha", "beta"] + [f"vgg16.s{si}_c{ci}"
                         for si, (_, n) in enumerate(_VGG16_STAGES) for ci in range(n)])


def _get_dists(path):
    backbone = os.environ.get("VGG16_PTH")
    cache_key = (path, backbone)
    if cache_key in _CACHE:
        return _CACHE[cache_key]
    model = DISTS()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    from ssl_tpu.utils.weight_port import load_torch_state_dict
    params = dict(variables["params"])
    filled: set = set()
    if backbone and os.path.exists(backbone):  # separate torchvision vgg16
        params = load_dists_weights(params, load_torch_state_dict(backbone, "params"),
                                    filled)
    params = load_dists_weights(params, load_torch_state_dict(path, "params"), filled)
    missing = DISTS_REQUIRED_NODES - filled
    if missing:
        # official weights.pt carries only alpha/beta — without VGG16_PTH the
        # backbone would silently score with random convs.
        raise ValueError(
            f"DISTS weights incomplete: {len(missing)} node(s) unfilled "
            f"(e.g. {sorted(missing)[:3]}). The official DISTS weights.pt has "
            "only alpha/beta — also set VGG16_PTH to a torchvision vgg16 "
            "state dict for the backbone convs.")
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    _CACHE[cache_key] = (model, variables)
    return _CACHE[cache_key]


@METRIC_REGISTRY.register(name="calculate_dists")
def calculate_dists(img, img2, crop_border=0, weights_path=None, **kwargs) -> float:
    """img, img2: HWC [0,255] RGB. Lower is better. Requires DISTS_PTH."""
    path = weights_path or os.environ.get("DISTS_PTH")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "DISTS weights not available in this zero-egress image. Set DISTS_PTH "
            "to the dists-pytorch checkpoint (architecture+scoring are implemented; "
            "only the pretrained weights are gated).")
    model, variables = _get_dists(path)
    a = np.asarray(img, np.float32) / 255.0
    b = np.asarray(img2, np.float32) / 255.0
    if crop_border:
        a = a[crop_border:-crop_border, crop_border:-crop_border]
        b = b[crop_border:-crop_border, crop_border:-crop_border]
    return float(model.apply(variables, jnp.asarray(a[None]), jnp.asarray(b[None]))[0])
