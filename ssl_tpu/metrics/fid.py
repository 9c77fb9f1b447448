"""FID — Frechet Inception Distance (reference: metrics/fid.py:50 + inception.py).

The InceptionV3 pool3 feature extractor is a flax port of the FID-variant
architecture; weights load from a torch .pth via ``FID_INCEPTION_PTH``
(zero-egress image: the official weights must be supplied by the user).
``calculate_fid`` itself is pure math over feature statistics and is fully
testable without weights."""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn
from scipy import linalg

from ssl_tpu.utils.registry import METRIC_REGISTRY


def calculate_fid_from_stats(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """Frechet distance between two Gaussians (reference fid.py:50-83)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        covmean = linalg.sqrtm(sigma1.dot(sigma2))
        if not np.isfinite(covmean).all():
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def stats_from_features(feats: np.ndarray):
    mu = np.mean(feats, axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


@METRIC_REGISTRY.register()
def calculate_fid(feats1=None, feats2=None, mu1=None, sigma1=None,
                  mu2=None, sigma2=None, **kwargs) -> float:
    if feats1 is not None:
        mu1, sigma1 = stats_from_features(np.asarray(feats1))
    if feats2 is not None:
        mu2, sigma2 = stats_from_features(np.asarray(feats2))
    return calculate_fid_from_stats(mu1, sigma1, mu2, sigma2)


# ---------------------------------------------------------------------------
# InceptionV3 (FID variant) — flax
# ---------------------------------------------------------------------------

class _BasicConv(nn.Module):
    features: int
    kernel: tuple
    strides: int = 1
    padding: str | tuple = "SAME"

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3)(x)
        return nn.relu(x)


class _InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = _BasicConv(64, (1, 1))(x)
        b5 = _BasicConv(48, (1, 1))(x)
        b5 = _BasicConv(64, (5, 5))(b5)
        b3 = _BasicConv(64, (1, 1))(x)
        b3 = _BasicConv(96, (3, 3))(b3)
        b3 = _BasicConv(96, (3, 3))(b3)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=False)  # FIDInceptionA patch
        bp = _BasicConv(self.pool_features, (1, 1))(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class _InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _BasicConv(384, (3, 3), strides=2, padding="VALID")(x)
        bd = _BasicConv(64, (1, 1))(x)
        bd = _BasicConv(96, (3, 3))(bd)
        bd = _BasicConv(96, (3, 3), strides=2, padding="VALID")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, bd, bp], axis=-1)


class _InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        b1 = _BasicConv(192, (1, 1))(x)
        b7 = _BasicConv(self.c7, (1, 1))(x)
        b7 = _BasicConv(self.c7, (1, 7))(b7)
        b7 = _BasicConv(192, (7, 1))(b7)
        bd = _BasicConv(self.c7, (1, 1))(x)
        bd = _BasicConv(self.c7, (7, 1))(bd)
        bd = _BasicConv(self.c7, (1, 7))(bd)
        bd = _BasicConv(self.c7, (7, 1))(bd)
        bd = _BasicConv(192, (1, 7))(bd)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                         count_include_pad=False)  # FIDInceptionC patch
        bp = _BasicConv(192, (1, 1))(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class _InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _BasicConv(192, (1, 1))(x)
        b3 = _BasicConv(320, (3, 3), strides=2, padding="VALID")(b3)
        b7 = _BasicConv(192, (1, 1))(x)
        b7 = _BasicConv(192, (1, 7))(b7)
        b7 = _BasicConv(192, (7, 1))(b7)
        b7 = _BasicConv(192, (3, 3), strides=2, padding="VALID")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, b7, bp], axis=-1)


class _InceptionE(nn.Module):
    pool_type: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = _BasicConv(320, (1, 1))(x)
        b3 = _BasicConv(384, (1, 1))(x)
        b3a = _BasicConv(384, (1, 3))(b3)
        b3b = _BasicConv(384, (3, 1))(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = _BasicConv(448, (1, 1))(x)
        bd = _BasicConv(384, (3, 3))(bd)
        bda = _BasicConv(384, (1, 3))(bd)
        bdb = _BasicConv(384, (3, 1))(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_type == "avg":
            bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                             count_include_pad=False)  # FIDInceptionE_1 patch
        else:  # FID variant: max pool in the last block
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = _BasicConv(192, (1, 1))(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Pool3 (2048-d) feature extractor, FID weight layout.

    Input NHWC in [0,1]; resized to 299 and normalized to [-1,1] like the
    reference wrapper (inception.py resize_input/normalize_input)."""

    @nn.compact
    def __call__(self, x):
        if x.shape[1:3] != (299, 299):
            # torch-exact F.interpolate bilinear (the reference wrapper,
            # inception.py:139) — jax.image.resize antialiases on downsample
            from ssl_tpu.ops.torch_resize import interp_torch
            x = interp_torch(x, (299, 299), "bilinear")
        x = x * 2.0 - 1.0
        x = _BasicConv(32, (3, 3), strides=2, padding="VALID")(x)
        x = _BasicConv(32, (3, 3), padding="VALID")(x)
        x = _BasicConv(64, (3, 3))(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = _BasicConv(80, (1, 1), padding="VALID")(x)
        x = _BasicConv(192, (3, 3), padding="VALID")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = _InceptionA(32)(x)
        x = _InceptionA(64)(x)
        x = _InceptionA(64)(x)
        x = _InceptionB()(x)
        x = _InceptionC(128)(x)
        x = _InceptionC(160)(x)
        x = _InceptionC(160)(x)
        x = _InceptionC(192)(x)
        x = _InceptionD()(x)
        x = _InceptionE("avg")(x)
        x = _InceptionE("max")(x)
        return x.mean(axis=(1, 2))  # (b, 2048) pool3


def load_inception(weights_path: str | None = None, seed: int = 0):
    """Build the extractor; load FID weights from .pth if provided/available
    (pt_inception-2015-12-05 layout via convert_fid_inception)."""
    model = InceptionV3FID()
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))
    path = weights_path or os.environ.get("FID_INCEPTION_PTH")
    if path and os.path.exists(path):
        from ssl_tpu.utils.weight_port import (convert_fid_inception,
                                               load_torch_state_dict)
        params, stats = convert_fid_inception(load_torch_state_dict(path))
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                     "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)}
    return model, variables
