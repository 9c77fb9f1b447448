"""LPIPS — Learned Perceptual Image Patch Similarity (reference: metrics/lpips.py).

AlexNet-feature flavor (the reference uses the `lpips` pip package with
AlexNet).  Architecture is defined here in flax; the learned linear-head and
backbone weights load from a torch .pth via ``LPIPS_ALEX_PTH`` (zero-egress
image).  Without weights the metric raises — tests cover only the wiring."""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ssl_tpu.utils.registry import METRIC_REGISTRY


class AlexNetFeatures(nn.Module):
    """Torchvision AlexNet.features, returning the 5 relu taps LPIPS uses."""

    @nn.compact
    def __call__(self, x):
        taps = []
        x = nn.Conv(64, (11, 11), strides=4, padding=((2, 2), (2, 2)), name="conv1")(x)
        x = nn.relu(x); taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), name="conv2")(x)); taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), name="conv3")(x)); taps.append(x)
        x = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv4")(x)); taps.append(x)
        x = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv5")(x)); taps.append(x)
        return taps


class LPIPSAlex(nn.Module):
    """Normalized feature distance with learned per-channel linear weights."""

    @nn.compact
    def __call__(self, x, y):
        # inputs NHWC in [-1, 1] (LPIPS convention)
        shift = jnp.asarray([-0.030, -0.088, -0.188])
        scale = jnp.asarray([0.458, 0.448, 0.450])
        xn = (x - shift) / scale
        yn = (y - shift) / scale
        net = AlexNetFeatures(name="net")
        fx = net(xn)
        fy = net(yn)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            # 1x1-conv lin head exactly as the lpips package (no abs — the
            # official heads are trained non-negative; we apply them verbatim)
            w = self.param(f"lin{i}", nn.initializers.ones, (d.shape[-1],))
            total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return total


_CACHED = {}


_ALEX_CONV_SHAPES = {(64, 3, 11, 11): "conv1", (192, 64, 5, 5): "conv2",
                     (384, 192, 3, 3): "conv3", (256, 384, 3, 3): "conv4",
                     (256, 256, 3, 3): "conv5"}


def load_lpips_weights(params: dict, sd: dict, filled: set | None = None) -> dict:
    """Overlay an AlexNet/lpips torch state dict onto the LPIPSAlex tree.

    Handles both layouts by SHAPE for the backbone convs (torchvision
    `features.{idx}.weight` and lpips-pkg `net.slice{n}.{idx}.weight` both
    carry the unique AlexNet conv shapes) and by NAME for the learned heads
    (`lin{i}.model.1.weight`, shape (1,C,1,1)).  Records every populated node
    name into ``filled`` so callers can verify nothing stayed at random init
    (the official lpips alex.pth carries ONLY the lin heads)."""
    import re
    from ssl_tpu.utils.weight_port import _conv_w, _to_np
    if filled is None:
        filled = set()
    params = dict(params)
    net = dict(params.get("net", {}))
    for k, v in sd.items():
        shape = tuple(int(s) for s in v.shape)
        if k.endswith(".weight") and shape in _ALEX_CONV_SHAPES:
            name = _ALEX_CONV_SHAPES[shape]
            node = {"kernel": _conv_w(v)}
            bk = k[: -len("weight")] + "bias"
            if bk in sd:
                node["bias"] = _to_np(sd[bk])
            net[name] = node
            filled.add(f"net.{name}")
        m = re.search(r"lin(\d)\.model\.1\.weight$", k)
        if m:
            params[f"lin{m.group(1)}"] = _to_np(v).reshape(-1)
            filled.add(f"lin{m.group(1)}")
    params["net"] = net
    return params


LPIPS_REQUIRED_NODES = frozenset(
    [f"net.conv{i}" for i in range(1, 6)] + [f"lin{i}" for i in range(5)])


def _get_lpips(weights_path=None):
    key = weights_path or os.environ.get("LPIPS_ALEX_PTH") or "_none_"
    backbone = os.environ.get("ALEXNET_PTH")
    cache_key = (key, backbone)
    if cache_key in _CACHED:
        return _CACHED[cache_key]
    model = LPIPSAlex()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    loaded = False
    if key != "_none_" and os.path.exists(key):
        from ssl_tpu.utils.weight_port import load_torch_state_dict
        params = dict(variables["params"])
        filled: set = set()
        if backbone and os.path.exists(backbone):  # separate torchvision alexnet
            params = load_lpips_weights(params, load_torch_state_dict(backbone, "params"),
                                        filled)
        params = load_lpips_weights(params, load_torch_state_dict(key, "params"), filled)
        missing = LPIPS_REQUIRED_NODES - filled
        if missing:
            # The official alex.pth has only lin heads; without ALEXNET_PTH the
            # backbone would silently score with random convs — refuse.
            raise ValueError(
                f"LPIPS weights incomplete: {sorted(missing)} not found in the "
                "checkpoint(s). The official lpips alex.pth carries only the "
                "lin heads — also set ALEXNET_PTH to a torchvision alexnet "
                "state dict for the backbone convs.")
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
        loaded = True
    _CACHED[cache_key] = (model, variables, loaded)
    return _CACHED[cache_key]


@METRIC_REGISTRY.register()
def calculate_lpips(img, img2, crop_border=0, weights_path=None, **kwargs) -> float:
    """img, img2: HWC [0,255] uint8/float RGB (reference convention).

    Requires LPIPS weights (LPIPS_ALEX_PTH); raises otherwise."""
    path = weights_path or os.environ.get("LPIPS_ALEX_PTH")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "LPIPS weights not available in this zero-egress image. Set "
            "LPIPS_ALEX_PTH to a torch lpips-alex checkpoint.")
    model, variables, _ = _get_lpips(path)
    a = np.asarray(img, np.float32) / 255.0
    b = np.asarray(img2, np.float32) / 255.0
    if crop_border:
        a = a[crop_border:-crop_border, crop_border:-crop_border]
        b = b[crop_border:-crop_border, crop_border:-crop_border]
    a = jnp.asarray(a[None] * 2 - 1)
    b = jnp.asarray(b[None] * 2 - 1)
    return float(model.apply(variables, a, b)[0])


# DISTS lives in ssl_tpu/metrics/dists_metric.py (full architecture + scoring).
