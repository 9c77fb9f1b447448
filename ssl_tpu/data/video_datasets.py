"""Video SR datasets (reference parity: data/reds_dataset.py:352,
vimeo90k_dataset.py:199, video_test_dataset.py:283 — BasicSR-inherited,
not exercised by any SSL training path, kept for capability parity).

Frames are returned stacked on a leading temporal axis: lq (t, h, w, c)."""

from __future__ import annotations

import os
import random

import numpy as np

from ssl_tpu.data.paired_image_dataset import BaseDataset
from ssl_tpu.data.transforms import augment, paired_random_crop
from ssl_tpu.utils.img_util import img2array, imread
from ssl_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class REDSDataset(BaseDataset):
    """REDS train set: meta_info lines `clip_name num_frames (h,w,c)`;
    neighboring-frame window with random temporal reverse."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        # io_backend 'lmdb' (reference reds_dataset.py:73-82): dataroots are
        # .lmdb dirs, frames fetched by '<clip>/<frame:08d>' key
        self.io_backend_opt = dict(opt.get("io_backend") or {"type": "disk"})
        self.is_lmdb = self.io_backend_opt.get("type") == "lmdb"
        self.file_client = None
        if self.is_lmdb:
            self.io_backend_opt["db_paths"] = [self.lq_root, self.gt_root]
            self.io_backend_opt["client_keys"] = ["lq", "gt"]
        self.num_frame = opt.get("num_frame", 5)
        self.scale = opt.get("scale", 4)
        self.gt_size = opt.get("gt_size", 256)
        with open(opt["meta_info_file"]) as f:
            self.keys = []
            for line in f:
                if not line.strip():
                    continue
                folder, frame_num = line.split(" ")[:2]
                self.keys.extend([f"{folder}/{i:08d}" for i in range(int(frame_num))])
        val_partition = opt.get("val_partition", ["000", "011", "015", "020"])
        self.keys = [k for k in self.keys if k.split("/")[0] not in val_partition]
        self.interval_list = opt.get("interval_list", [1])
        self.random_reverse = opt.get("random_reverse", False)

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        key = self.keys[index]
        clip, frame = key.split("/")
        center = int(frame)
        interval = random.choice(self.interval_list)
        half = self.num_frame // 2
        start = center - half * interval
        end = center + half * interval
        while start < 0 or end > 99:
            center = random.randint(0, 99)
            start = center - half * interval
            end = center + half * interval
        neighbors = list(range(start, end + 1, interval))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()
        def read(root, name, client_key):
            if not self.is_lmdb:
                return img2array(imread(os.path.join(root, clip, name + ".png")))
            from ssl_tpu.data.file_client import FileClient
            from ssl_tpu.utils.img_util import imfrombytes
            if self.file_client is None:
                kw = dict(self.io_backend_opt)
                self.file_client = FileClient(kw.pop("type"), **kw)
            return img2array(imfrombytes(
                self.file_client.get(f"{clip}/{name}", client_key), float32=True))

        lqs = [read(self.lq_root, f"{n:08d}", "lq") for n in neighbors]
        gt = read(self.gt_root, f"{center:08d}", "gt")
        gt, lqs = paired_random_crop(gt, lqs, self.gt_size, self.scale)
        out = augment(lqs + [gt], self.opt.get("use_hflip", True), self.opt.get("use_rot", True))
        lqs, gt = out[:-1], out[-1]
        return {"lq": np.stack(lqs), "gt": gt, "key": key}


@DATASET_REGISTRY.register()
class Vimeo90KDataset(BaseDataset):
    """Vimeo-90K septuplets: 7 LQ frames -> center GT frame."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.scale = opt.get("scale", 4)
        self.gt_size = opt.get("gt_size", 256)
        with open(opt["meta_info_file"]) as f:
            self.keys = [line.split(" ")[0] for line in f if line.strip()]
        self.num_frame = opt.get("num_frame", 7)

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        key = self.keys[index]
        lqs = [img2array(imread(os.path.join(self.lq_root, key, f"im{i}.png")))
               for i in range(1, self.num_frame + 1)]
        gt = img2array(imread(os.path.join(self.gt_root, key, "im4.png")))
        gt, lqs = paired_random_crop(gt, lqs, self.gt_size, self.scale)
        out = augment(lqs + [gt], self.opt.get("use_hflip", True), self.opt.get("use_rot", True))
        return {"lq": np.stack(out[:-1]), "gt": out[-1], "key": key}


@DATASET_REGISTRY.register()
class VideoTestDataset(BaseDataset):
    """Per-frame test set (reference video_test_dataset.py:12-132).

    Without ``num_frame``: yields single frames (backwards-compatible mode).
    With ``num_frame`` (sliding-window mode, the reference's semantics):
    yields an lq stack (t, h, w, c) of neighbors around each frame (edge
    handling via ``padding``), the center-frame gt, plus ``folder``,
    ``idx`` ('i/max') and ``border`` bookkeeping for the per-folder video
    validation protocol (video_base_model.py:18-111)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.num_frame = opt.get("num_frame")
        self.padding = opt.get("padding", "reflection")
        self.items = []
        self.folder_len = {}
        for clip in sorted(os.listdir(self.lq_root)):
            frames = sorted(os.listdir(os.path.join(self.lq_root, clip)))
            self.folder_len[clip] = len(frames)
            for i, f in enumerate(frames):
                self.items.append((clip, f, i, frames))
        self.paths = [os.path.join(c, f) for c, f, _, _ in self.items]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index):
        clip, fname, idx, frames = self.items[index]
        max_idx = self.folder_len[clip]
        d = {"folder": clip, "idx": f"{idx}/{max_idx}",
             "lq_path": os.path.join(self.lq_root, clip, fname)}
        if self.num_frame:
            from ssl_tpu.data.data_util import generate_frame_indices
            sel = generate_frame_indices(idx, max_idx, self.num_frame, self.padding)
            d["lq"] = np.stack([img2array(imread(os.path.join(self.lq_root, clip, frames[i])))
                                for i in sel])
            d["border"] = int(idx < self.num_frame // 2 or idx >= max_idx - self.num_frame // 2)
        else:
            d["lq"] = img2array(imread(os.path.join(self.lq_root, clip, fname)))
        gt_path = os.path.join(self.gt_root, clip, fname)
        if os.path.exists(gt_path):
            d["gt"] = img2array(imread(gt_path))
        return d


@DATASET_REGISTRY.register()
class VideoRecurrentTestDataset(BaseDataset):
    """Whole-clip test set for recurrent archs (reference
    video_test_dataset.py:252-283): one item per folder, lq/gt are the full
    frame sequences (t, h, w, c)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.folders = sorted(os.listdir(self.lq_root))

    def __len__(self):
        return len(self.folders)

    def __getitem__(self, index):
        clip = self.folders[index]
        frames = sorted(os.listdir(os.path.join(self.lq_root, clip)))
        lq = np.stack([img2array(imread(os.path.join(self.lq_root, clip, f))) for f in frames])
        d = {"lq": lq, "folder": clip,
             "lq_path": os.path.join(self.lq_root, clip, frames[0])}
        if os.path.isdir(os.path.join(self.gt_root, clip)):
            d["gt"] = np.stack([img2array(imread(os.path.join(self.gt_root, clip, f)))
                                for f in frames])
        return d
