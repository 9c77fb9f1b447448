"""CLIPIQA folder CLI (reference surface: scripts/metrics/calculate_clipiqa.py).

No-reference metric: scores the restored folder only.  Needs CLIP_RN50_PTH
(OpenAI CLIP RN50 checkpoint) and CLIP_BPE_PATH (BPE vocab) or --prompt_tokens
(precomputed (2k,77) token ids for the k antonym pairs; the default is the
reference CLIPIQA's 5 pairs, ssl_tpu.metrics.clipiqa.ANTONYM_PROMPTS)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--restored", required=True)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--prompt_tokens", default=None, help=".npy (2,77) int ids")
    args = parser.parse_args()

    from ssl_tpu.metrics.clipiqa import calculate_clipiqa
    tokens = np.load(args.prompt_tokens) if args.prompt_tokens else None
    vals = []
    for i, name in enumerate(sorted(os.listdir(args.restored))):
        img = cv2.imread(os.path.join(args.restored, name), cv2.IMREAD_COLOR)
        if img is None:
            continue
        val = calculate_clipiqa(img[..., ::-1], weights_path=args.weights,
                                prompt_tokens=tokens)
        vals.append(val)
        print(f"{i + 1:3d} {name:25}. \tCLIPIQA: {val:.6f}")
    if vals:
        print(f"Average CLIPIQA: {np.mean(vals):.6f} ({len(vals)} images)")


if __name__ == "__main__":
    main()
