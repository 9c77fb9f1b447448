"""Matlab-bicubic LR synthesis (reference workflow: GT mod-12 crop then
bicubic down, datasets/README_TEST.MD §1.2), plus the offline degraded-LR
generator (generate_RealESRGAN+BSRGAN_LR.py surface: apply RealESRGAN or
BSRGAN degradations offline to build real-world test sets)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import cv2
import numpy as np

from ssl_tpu.utils.matlab_resize import imresize_uint8


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--mod", type=int, default=12, help="mod-crop GT first (0=off)")
    parser.add_argument("--gt_output", default=None, help="save mod-cropped GT here")
    parser.add_argument("--mode", choices=["bicubic", "realesrgan", "bsrgan"], default="bicubic")
    parser.add_argument("--list", dest="list_file", default=None,
                        help="meta list of relative sub-dirs/files (e.g. Vimeo90K "
                             "sep_trainlist.txt '00001/0001' septuplets, the "
                             "generate_LR_Vimeo90K.m workflow); structure is "
                             "mirrored under --output")
    args = parser.parse_args()

    os.makedirs(args.output, exist_ok=True)
    if args.gt_output:
        os.makedirs(args.gt_output, exist_ok=True)

    if args.mode != "bicubic":
        from ssl_tpu.data.realesr_degradation import RealESRGANDegrader
        from ssl_tpu.data.bsrgan_degradation import degradation_bsrgan
        from ssl_tpu.data.realesrgan_dataset import _KernelSynth
        synth = _KernelSynth({})
        degrader = RealESRGANDegrader({}, scale=args.scale, queue_size=0)
        degrader.pool = None

    if args.list_file:
        names = []
        with open(args.list_file) as f:
            for rel in (ln.strip() for ln in f if ln.strip()):
                full = os.path.join(args.input, rel)
                if os.path.isdir(full):
                    names.extend(os.path.join(rel, fn) for fn in sorted(os.listdir(full)))
                else:
                    names.append(rel)
    else:
        names = sorted(os.listdir(args.input))

    for i, name in enumerate(names):
        img = cv2.imread(os.path.join(args.input, name), cv2.IMREAD_COLOR)
        if img is None:
            continue
        os.makedirs(os.path.dirname(os.path.join(args.output, name)) or ".",
                    exist_ok=True)
        if args.gt_output:
            os.makedirs(os.path.dirname(os.path.join(args.gt_output, name)) or ".",
                        exist_ok=True)
        if args.mod:
            h, w = img.shape[:2]
            img = img[: h - h % args.mod, : w - w % args.mod]
        if args.gt_output:
            cv2.imwrite(os.path.join(args.gt_output, name), img)
        if args.mode == "bicubic":
            lr = imresize_uint8(img, 1.0 / args.scale)
        elif args.mode == "realesrgan":
            rgb = img[..., ::-1].astype(np.float32) / 255.0
            k1, k2, sinc = synth.sample()
            lq = degrader.degrade_batch(rgb[None], [k1], [k2], [sinc])[0]
            lr = (lq[..., ::-1] * 255).round().astype(np.uint8)
        else:  # bsrgan
            rgb = img[..., ::-1].astype(np.float32) / 255.0
            lq, _ = degradation_bsrgan(rgb, args.scale,
                                       min(rgb.shape[0], rgb.shape[1]) // args.scale)
            lr = (lq[..., ::-1] * 255).round().astype(np.uint8)
        cv2.imwrite(os.path.join(args.output, name), lr)
        if (i + 1) % 50 == 0:
            print(f"[{i + 1}]")
    print("done")


if __name__ == "__main__":
    main()
