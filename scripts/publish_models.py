"""Publish checkpoints: sha8-stamp filenames (reference surface:
GAN-Based-SR/scripts/publish_models.py — update sha + rename
``name.pth`` -> ``name-<sha8>.pth``).

Works on both our orbax/pickle ``.pkl`` saves and converted torch ``.pth``
files.  For ``.pth`` it mirrors the reference's key check (warn when neither
``params`` nor ``params_ema`` is present); ``.pkl`` files are checked for a
pickled mapping/pytree.
"""

import argparse
import glob
import hashlib
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def sha8(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:8]


def check_keys(path: str, assume_yes: bool) -> bool:
    if path.endswith((".pth", ".pt")):
        import torch
        try:
            net = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            net = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(net, dict) and ("params" in net or "params_ema" in net):
            return True
    else:
        try:
            with open(path, "rb") as f:
                obj = pickle.load(f)
            if isinstance(obj, dict):
                return True
        except Exception:
            pass
    if assume_yes:
        return True
    resp = input(f'WARN: {os.path.basename(path)} has no "params"/"params_ema" '
                 "key (or is not a mapping). Continue? Y/N\n")
    return resp.strip().lower() == "y"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("paths", nargs="+",
                        help="checkpoint files or globs (.pkl/.pth/.pt)")
    parser.add_argument("--yes", action="store_true",
                        help="skip the interactive key-check prompt")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    files = []
    for p in args.paths:
        files.extend(sorted(glob.glob(p)) or [p])
    for idx, path in enumerate(files):
        if not os.path.isfile(path):
            print(f"{idx + 1:03d}: skip (not a file): {path}")
            continue
        base, ext = os.path.splitext(path)
        if len(base) > 9 and base[-9] == "-" and all(
                c in "0123456789abcdef" for c in base[-8:]):
            print(f"{idx + 1:03d}: already stamped: {path}")
            continue
        if not check_keys(path, args.yes):
            raise ValueError(f"aborted at {path}")
        digest = sha8(path)
        new_path = f"{base}-{digest}{ext}"
        print(f"{idx + 1:03d}: {path} -> {new_path}")
        if not args.dry_run:
            os.rename(path, new_path)


if __name__ == "__main__":
    main()
