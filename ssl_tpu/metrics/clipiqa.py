"""CLIPIQA — no-reference quality via CLIP antonym prompts.

Reference parity target: scripts/metrics/calculate_clipiqa.py + vendored
clipiqa_pyiqa/clipiqa_arch.py.  The CLI instantiates the DEFAULT
``model_type='clipiqa'`` (clipiqa_arch.py:96-132): the image is encoded with
``pos_embedding=False`` (no attention-pool positional embedding, so any
input size works), text features come from FIVE fixed antonym prompt pairs
('Good image'/'bad image', 'Sharp image'/'blurry image', 'sharp edges'/
'blurry edges', 'High resolution image'/'low resolution image',
'Noise-free image'/'noisy image'), logits are scaled by the model's LEARNED
``exp(logit_scale)``, each pair is softmaxed, and the score is the mean of
the positive-side probabilities (clipiqa_arch.py:124-132).  (The learned
PromptLearner around "Good photo."/"Bad photo." belongs to the 'clipiqa+'
variant, which the reference CLI does not use.)

Zero-egress gating: the scoring math and pipeline are implemented here; the
CLIP RN50 backbone weights must be supplied (CLIP_RN50_PTH) and are converted
on load.  Without weights the metric raises with instructions."""

from __future__ import annotations

import os

import numpy as np

from ssl_tpu.utils.registry import METRIC_REGISTRY


ANTONYM_PROMPTS = [
    "Good image", "bad image",
    "Sharp image", "blurry image",
    "sharp edges", "blurry edges",
    "High resolution image", "low resolution image",
    "Noise-free image", "noisy image",
]


def clipiqa_score(image_features: np.ndarray, text_features: np.ndarray,
                  logit_scale: float = 100.0) -> float:
    """Core scoring (clipiqa_arch.py:124-132): cosine logits against 2k
    antonym text features, per-pair softmax, mean positive probability.
    ``text_features``: (2k, embed) rows ordered (pos, neg) per pair."""
    img = image_features / (np.linalg.norm(image_features) + 1e-10)
    txt = text_features / (np.linalg.norm(text_features, axis=-1,
                                          keepdims=True) + 1e-10)
    logits = (logit_scale * txt @ img).reshape(-1, 2)
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    probs = e / e.sum(axis=-1, keepdims=True)
    return float(probs[:, 0].mean())


_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

_cache: dict = {}


def _load_clip(path: str):
    if path in _cache:
        return _cache[path]
    import jax
    import jax.numpy as jnp
    from ssl_tpu.archs.clip_arch import CLIPTextEncoder, ModifiedResNet
    from ssl_tpu.utils.weight_port import convert_clip_rn50, load_torch_state_dict
    sd = load_torch_state_dict(path, "state_dict")
    vis_p, vis_s, text_p = convert_clip_rn50(sd)
    width = sd["visual.conv1.weight"].shape[0] * 2
    embed = sd["text_projection"].shape[1]
    n_layers = len([k for k in sd if k.endswith(".ln_1.weight")])
    twidth = sd["positional_embedding"].shape[1]
    import re
    counts = [0, 0, 0, 0]
    for k in sd:
        m = re.match(r"visual\.layer(\d)\.(\d+)\.conv1\.weight", k)
        if m:
            li, j = int(m.group(1)), int(m.group(2))
            counts[li - 1] = max(counts[li - 1], j + 1)
    spacial = int(round((sd["visual.attnpool.positional_embedding"].shape[0] - 1)
                        ** 0.5))
    visual = ModifiedResNet(layers=tuple(counts), width=width,
                            output_dim=embed, heads=width // 2,
                            attn_spacial_dim=spacial)
    textenc = CLIPTextEncoder(width=twidth, layers=n_layers,
                              heads=max(1, twidth // 64), embed_dim=embed,
                              vocab_size=sd["token_embedding.weight"].shape[0])
    as_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    logit_scale = float(np.exp(np.asarray(sd["logit_scale"], np.float32))) \
        if "logit_scale" in sd else 100.0
    bundle = (visual, as_j(vis_p), as_j(vis_s), textenc, as_j(text_p), logit_scale)
    _cache[path] = bundle
    return bundle


@METRIC_REGISTRY.register()
def calculate_clipiqa(img, weights_path=None, prompt_tokens=None, **kwargs) -> float:
    """img: HWC uint8/float [0,255].  weights_path: OpenAI CLIP RN50 .pt.
    prompt_tokens: (2k, 77) int token ids for k antonym pairs (default: the
    reference's 5 pairs, see ``ANTONYM_PROMPTS``); needed because the BPE
    vocab is not vendored (zero-egress) — precompute with any CLIP tokenizer
    or point CLIP_BPE_PATH at the merges file."""
    import jax.numpy as jnp
    path = weights_path or os.environ.get("CLIP_RN50_PTH")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "CLIPIQA requires CLIP RN50 weights (set CLIP_RN50_PTH); the backbone "
            "(archs/clip_arch.py) and converter (convert_clip_rn50) are wired.")
    if prompt_tokens is None:
        tok_path = os.environ.get("CLIP_PROMPT_TOKENS_NPY")
        if tok_path and os.path.exists(tok_path):
            prompt_tokens = np.load(tok_path)
        elif os.environ.get("CLIP_BPE_PATH"):
            from ssl_tpu.utils.clip_tokenizer import SimpleTokenizer
            prompt_tokens = SimpleTokenizer().tokenize(ANTONYM_PROMPTS)
        else:
            raise FileNotFoundError(
                "CLIPIQA needs the antonym prompt token ids: pass prompt_tokens, "
                "set CLIP_PROMPT_TOKENS_NPY to a (2k,77) int .npy, or set "
                "CLIP_BPE_PATH to the CLIP merges file for on-the-fly tokenizing.")
    visual, vis_p, vis_s, textenc, text_p, logit_scale = _load_clip(path)
    x = np.asarray(img, np.float32) / 255.0
    x = (x - _CLIP_MEAN) / _CLIP_STD
    # pos_embedding=False: the reference CLI's default CLIPIQA mode
    feats = visual.apply({"params": vis_p, "batch_stats": vis_s}, jnp.asarray(x)[None])
    tfeats = textenc.apply({"params": text_p}, jnp.asarray(prompt_tokens, jnp.int32))
    return clipiqa_score(np.asarray(feats)[0], np.asarray(tfeats), logit_scale)


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
