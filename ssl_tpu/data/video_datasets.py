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


@DATASET_REGISTRY.register()
class REDSRecurrentDataset(BaseDataset):
    """REDS train set for recurrent nets (reference reds_dataset.py:209-352):
    `num_frame` CONSECUTIVE frames per item — the window is
    [start, start + num_frame*interval), re-rolled when it would cross the
    clip end — and BOTH lq and gt are full (t, h, w, c) stacks.
    `val_partition` is the reference's string switch ('REDS4' | 'official')
    with `test_mode` selecting which side of the split to keep.  Clip length
    comes from the meta_info frame counts (the reference hardcodes the REDS
    clip length 100; identical behavior on real REDS)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.num_frame = opt["num_frame"]
        self.scale = opt.get("scale", 4)
        self.gt_size = opt.get("gt_size", 256)
        self.io_backend_opt = dict(opt.get("io_backend") or {"type": "disk"})
        self.is_lmdb = self.io_backend_opt.get("type") == "lmdb"
        self.file_client = None
        if self.is_lmdb:
            self.io_backend_opt["db_paths"] = [self.lq_root, self.gt_root]
            self.io_backend_opt["client_keys"] = ["lq", "gt"]
        self.keys = []
        self.clip_len = {}
        with open(opt["meta_info_file"]) as f:
            for line in f:
                if not line.strip():
                    continue
                folder, frame_num = line.split(" ")[:2]
                self.clip_len[folder] = int(frame_num)
                self.keys.extend(f"{folder}/{i:08d}" for i in range(int(frame_num)))
        vp = opt.get("val_partition", "REDS4")
        if vp == "REDS4":
            val_partition = ["000", "011", "015", "020"]
        elif vp == "official":
            val_partition = [f"{v:03d}" for v in range(240, 270)]
        else:
            raise ValueError(f"Wrong validation partition {vp}. "
                             f"Supported ones are ['official', 'REDS4'].")
        if opt.get("test_mode"):
            self.keys = [k for k in self.keys if k.split("/")[0] in val_partition]
        else:
            self.keys = [k for k in self.keys if k.split("/")[0] not in val_partition]
        self.interval_list = opt.get("interval_list", [1])
        self.random_reverse = opt.get("random_reverse", False)

    def __len__(self):
        return len(self.keys)

    def _read(self, root, clip, name, client_key):
        if not self.is_lmdb:
            return img2array(imread(os.path.join(root, clip, name + ".png")))
        from ssl_tpu.data.file_client import FileClient
        from ssl_tpu.utils.img_util import imfrombytes
        if self.file_client is None:
            kw = dict(self.io_backend_opt)
            self.file_client = FileClient(kw.pop("type"), **kw)
        return img2array(imfrombytes(
            self.file_client.get(f"{clip}/{name}", client_key), float32=True))

    def __getitem__(self, index):
        key = self.keys[index]
        clip, frame = key.split("/")
        clip_len = self.clip_len.get(clip, 100)
        interval = random.choice(self.interval_list)
        start = int(frame)
        if start > clip_len - self.num_frame * interval:
            start = random.randint(0, clip_len - self.num_frame * interval)
        neighbors = list(range(start, start + self.num_frame * interval, interval))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()
        lqs = [self._read(self.lq_root, clip, f"{n:08d}", "lq") for n in neighbors]
        gts = [self._read(self.gt_root, clip, f"{n:08d}", "gt") for n in neighbors]
        gts, lqs = paired_random_crop(gts, lqs, self.gt_size, self.scale)
        out = augment(lqs + gts, self.opt.get("use_hflip", True),
                      self.opt.get("use_rot", True))
        t = len(out) // 2
        return {"lq": np.stack(out[:t]), "gt": np.stack(out[t:]), "key": key}


@DATASET_REGISTRY.register()
class Vimeo90KRecurrentDataset(Vimeo90KDataset):
    """Vimeo-90K septuplets for recurrent nets (reference
    vimeo90k_dataset.py:137-199): all 7 frames are returned as BOTH lq and gt
    (t, h, w, c); `flip_sequence` doubles 7 -> 14 by appending the temporal
    reverse; `random_reverse` flips the read order."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.flip_sequence = opt.get("flip_sequence", False)
        self.random_reverse = opt.get("random_reverse", False)

    def __getitem__(self, index):
        key = self.keys[index]
        neighbors = list(range(1, 8))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()
        lqs = [img2array(imread(os.path.join(self.lq_root, key, f"im{i}.png")))
               for i in neighbors]
        gts = [img2array(imread(os.path.join(self.gt_root, key, f"im{i}.png")))
               for i in neighbors]
        gts, lqs = paired_random_crop(gts, lqs, self.gt_size, self.scale)
        out = augment(lqs + gts, self.opt.get("use_hflip", True),
                      self.opt.get("use_rot", True))
        lq, gt = np.stack(out[:7]), np.stack(out[7:])
        if self.flip_sequence:
            lq = np.concatenate([lq, lq[::-1]], axis=0)
            gt = np.concatenate([gt, gt[::-1]], axis=0)
        return {"lq": lq, "gt": gt, "key": key}


@DATASET_REGISTRY.register()
class VideoTestVimeo90KDataset(BaseDataset):
    """Vimeo90K-Test center-frame protocol (reference
    video_test_dataset.py:134-198): one item per septuplet from the meta_info
    list; lq is the num_frame window `i + (9-num_frame)//2` and gt is im4;
    folder is the constant 'vimeo90k' and border always 0."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root = opt["dataroot_gt"]
        self.lq_root = opt["dataroot_lq"]
        self.num_frame = opt.get("num_frame", 7)
        self.neighbor_list = [i + (9 - self.num_frame) // 2
                              for i in range(self.num_frame)]
        with open(opt["meta_info_file"]) as f:
            self.subfolders = [line.split(" ")[0] for line in f if line.strip()]

    def __len__(self):
        return len(self.subfolders)

    def __getitem__(self, index):
        sub = self.subfolders[index]
        lq_paths = [os.path.join(self.lq_root, sub, f"im{i}.png")
                    for i in self.neighbor_list]
        lq = np.stack([img2array(imread(p)) for p in lq_paths])
        gt = img2array(imread(os.path.join(self.gt_root, sub, "im4.png")))
        return {"lq": lq, "gt": gt, "folder": "vimeo90k",
                "idx": f"{index}/{len(self.subfolders)}", "border": 0,
                "lq_path": lq_paths[self.num_frame // 2]}


@DATASET_REGISTRY.register()
class VideoTestDUFDataset(VideoTestDataset):
    """DUF test protocol (reference video_test_dataset.py:202-248): windowed
    VideoTestDataset where `use_duf_downsampling` synthesizes the LQ window
    from the (mod-cropped) GT frames via the official 13-tap Gaussian
    stride-`scale` downsampler; gt is the mod-cropped center frame."""

    def __init__(self, opt: dict):
        if opt.get("use_duf_downsampling") and not os.path.isdir(opt.get("dataroot_lq") or ""):
            opt = dict(opt, dataroot_lq=opt["dataroot_gt"])  # frames come from GT
        super().__init__(opt)

    def __getitem__(self, index):
        from ssl_tpu.data.data_util import duf_downsample, generate_frame_indices
        from ssl_tpu.data.transforms import mod_crop

        clip, fname, idx, frames = self.items[index]
        max_idx = self.folder_len[clip]
        num_frame = self.num_frame or self.opt["num_frame"]
        sel = generate_frame_indices(idx, max_idx, num_frame, self.padding)
        scale = self.opt.get("scale", 4)
        gt_frames = sorted(os.listdir(os.path.join(self.gt_root, clip)))
        if self.opt.get("use_duf_downsampling"):
            gts = np.stack([mod_crop(img2array(imread(
                os.path.join(self.gt_root, clip, gt_frames[i]))), scale)
                for i in sel])
            lq = duf_downsample(gts, kernel_size=13, scale=scale)
        else:
            lq = np.stack([img2array(imread(
                os.path.join(self.lq_root, clip, frames[i]))) for i in sel])
        gt = mod_crop(img2array(imread(
            os.path.join(self.gt_root, clip, gt_frames[idx]))), scale)
        return {"lq": lq, "gt": gt, "folder": clip, "idx": f"{idx}/{max_idx}",
                "border": int(idx < num_frame // 2 or idx >= max_idx - num_frame // 2),
                "lq_path": os.path.join(self.lq_root, clip, fname)}
