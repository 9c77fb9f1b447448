"""Path-pairing helpers (reference: data/data_util.py)."""

from __future__ import annotations

import os


def scandir(dir_path, suffix=None, recursive=False, full_path=False):
    """Yield file paths under dir_path (reference utils/misc.py:52)."""
    for entry in sorted(os.listdir(dir_path)):
        full = os.path.join(dir_path, entry)
        if os.path.isfile(full):
            rel = full if full_path else entry
            if suffix is None or rel.endswith(tuple(suffix) if isinstance(suffix, (list, tuple)) else suffix):
                yield rel
        elif recursive and os.path.isdir(full):
            for sub in scandir(full, suffix, recursive, full_path=False):
                yield sub if not full_path else os.path.join(full, sub)


def paired_paths_from_folders(folders, keys, filename_tmpl="{}"):
    """Pair files from [input_folder, gt_folder] by basename (reference
    data_util.py paired_paths_from_folder)."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    input_paths = list(scandir(input_folder))
    gt_paths = list(scandir(gt_folder))
    assert len(input_paths) == len(gt_paths), (
        f"{input_key} and {gt_key} datasets have different number of images: "
        f"{len(input_paths)}, {len(gt_paths)}.")
    paths = []
    for gt_path in sorted(gt_paths):
        basename, ext = os.path.splitext(os.path.basename(gt_path))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        input_path = os.path.join(input_folder, input_name)
        assert input_name in input_paths, f"{input_name} is not in {input_key}_paths."
        paths.append({f"{input_key}_path": input_path,
                      f"{gt_key}_path": os.path.join(gt_folder, gt_path)})
    return paths


def paired_paths_from_meta_info_file(folders, keys, meta_info_file, filename_tmpl="{}"):
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    with open(meta_info_file, "r") as f:
        gt_names = [line.strip().split(" ")[0] for line in f if line.strip()]
    paths = []
    for gt_name in gt_names:
        basename, ext = os.path.splitext(os.path.basename(gt_name))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        paths.append({f"{input_key}_path": os.path.join(input_folder, input_name),
                      f"{gt_key}_path": os.path.join(gt_folder, gt_name)})
    return paths


def paired_paths_from_lmdb(folders, keys):
    """Reference data_util.py paired_paths_from_lmdb: both roots are .lmdb
    directories; item keys come from each meta_info.txt (lines
    '<name>.png (h,w,c) <compress_level>'), stored without extension."""
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    if not (str(input_folder).endswith(".lmdb") and str(gt_folder).endswith(".lmdb")):
        raise ValueError(
            f"{input_key} folder and {gt_key} folder should both in lmdb "
            f"formats. But received {input_key}: {input_folder}; "
            f"{gt_key}: {gt_folder}")

    def read_keys(folder):
        with open(os.path.join(folder, "meta_info.txt")) as f:
            return {line.split(".")[0] for line in f if line.strip()}

    input_set, gt_set = read_keys(input_folder), read_keys(gt_folder)
    if input_set != gt_set:
        raise ValueError(f"Keys in {input_key}_folder and {gt_key}_folder "
                         "are different.")
    return [{f"{input_key}_path": k, f"{gt_key}_path": k}
            for k in sorted(gt_set)]


def paths_from_folder(folder):
    return [os.path.join(folder, p) for p in scandir(folder)]


def paired_paths_with_mask(folders, keys, filename_tmpl="{}", mask_ext=".mat"):
    """Triplet pairing: LQ + GT + per-GT edge-mask file (reference
    paired_image_mask_dataset.py:31-46 pairs via identical basenames)."""
    assert len(folders) == 3 and len(keys) == 3
    input_folder, gt_folder, mask_folder = folders
    input_key, gt_key, mask_key = keys
    pairs = paired_paths_from_folders([input_folder, gt_folder], [input_key, gt_key], filename_tmpl)
    for d in pairs:
        basename = os.path.splitext(os.path.basename(d[f"{gt_key}_path"]))[0]
        for ext in (mask_ext, ".mat", ".png", ".npy"):
            cand = os.path.join(mask_folder, basename + ext)
            if os.path.exists(cand):
                d[f"{mask_key}_path"] = cand
                break
        else:
            raise FileNotFoundError(f"no mask found for {basename} in {mask_folder}")
    return pairs


def generate_frame_indices(crt_idx, max_frame_num, num_frames, padding="reflection"):
    """Window of `num_frames` neighbor indices around `crt_idx`, clip edges
    handled by the padding mode (reference data_util.py:43-94: replicate /
    reflection / reflection_circle / circle)."""
    assert num_frames % 2 == 1, "num_frames should be an odd number."
    assert padding in ("replicate", "reflection", "reflection_circle", "circle"), \
        f"Wrong padding mode: {padding}."
    max_frame_num = max_frame_num - 1  # 0-based last index
    num_pad = num_frames // 2
    indices = []
    for i in range(crt_idx - num_pad, crt_idx + num_pad + 1):
        if i < 0:
            if padding == "replicate":
                pad_idx = 0
            elif padding == "reflection":
                pad_idx = -i
            elif padding == "reflection_circle":
                pad_idx = crt_idx + num_pad - i
            else:
                pad_idx = num_frames + i
        elif i > max_frame_num:
            if padding == "replicate":
                pad_idx = max_frame_num
            elif padding == "reflection":
                pad_idx = max_frame_num * 2 - i
            elif padding == "reflection_circle":
                pad_idx = (crt_idx - num_pad) - (i - max_frame_num)
            else:
                pad_idx = i - num_frames
        else:
            pad_idx = i
        indices.append(pad_idx)
    return indices


def generate_gaussian_kernel(kernel_size: int = 13, sigma: float = 1.6):
    """Sampled-and-normalized 2-D Gaussian placed on a kernel_size grid
    (reference data_util.py:314-329: a dirac smoothed by
    scipy.ndimage.gaussian_filter — that operation's support radius is
    int(4*sigma + 0.5), which fits inside the 13-tap grid for every
    supported DUF scale, so the result is exactly the separable sampled
    Gaussian re-centred on the grid)."""
    import numpy as np

    radius = int(4.0 * sigma + 0.5)
    assert radius <= kernel_size // 2, (
        f"sigma {sigma} support ({radius}) exceeds the {kernel_size}-tap grid")
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    phi /= phi.sum()
    g1 = np.zeros(kernel_size, np.float64)
    c = kernel_size // 2
    g1[c - radius:c + radius + 1] = phi
    return np.outer(g1, g1)


def duf_downsample(x, kernel_size: int = 13, scale: int = 4):
    """DUF's official Gaussian downsampling (reference data_util.py:332-362):
    reflect-pad by kernel//2 + 2*scale, stride-`scale` Gaussian conv with
    sigma = 0.4*scale, then trim 2 px per side.  Host-side numpy on HWC
    frames: x is (t, h, w, c) or (h, w, c)."""
    import numpy as np

    assert scale in (2, 3, 4), f"Only support scale (2, 3, 4), but got {scale}."
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    pad = kernel_size // 2 + scale * 2
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    k = generate_gaussian_kernel(kernel_size, 0.4 * scale)
    win = np.lib.stride_tricks.sliding_window_view(
        xp, (kernel_size, kernel_size), axis=(1, 2))[:, ::scale, ::scale]
    y = np.tensordot(win, k, axes=([-2, -1], [0, 1]))
    y = y[:, 2:-2, 2:-2].astype(x.dtype)
    return y[0] if squeeze else y
