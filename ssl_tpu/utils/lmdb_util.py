"""LMDB dataset creation (reference surface: utils/lmdb_util.py).

Builds an image LMDB with the BasicSR layout: data.mdb/lock.mdb +
meta_info.txt lines `name.png (h,w,c) compress_level`."""

from __future__ import annotations

import os

import cv2


def make_lmdb_from_imgs(data_path: str, lmdb_path: str, img_path_list, keys,
                        batch: int = 5000, compress_level: int = 1,
                        map_size: int | None = None) -> None:
    try:
        import lmdb
    except ImportError as e:
        raise ImportError("make_lmdb_from_imgs requires the 'lmdb' package") from e
    assert len(img_path_list) == len(keys)
    if not lmdb_path.endswith(".lmdb"):
        raise ValueError("lmdb_path must end with '.lmdb'.")
    if os.path.exists(lmdb_path):
        raise FileExistsError(f"Folder {lmdb_path} already exists.")

    if map_size is None:
        img = cv2.imread(os.path.join(data_path, img_path_list[0]), cv2.IMREAD_UNCHANGED)
        _, img_byte = cv2.imencode(".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        map_size = len(img_byte) * len(img_path_list) * 10

    env = lmdb.open(lmdb_path, map_size=map_size)
    txn = env.begin(write=True)
    meta = []
    for idx, (path, key) in enumerate(zip(img_path_list, keys)):
        img = cv2.imread(os.path.join(data_path, path), cv2.IMREAD_UNCHANGED)
        h, w = img.shape[:2]
        c = 1 if img.ndim == 2 else img.shape[2]
        _, img_byte = cv2.imencode(".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        txn.put(key.encode("ascii"), img_byte.tobytes())
        meta.append(f"{key}.png ({h},{w},{c}) {compress_level}")
        if (idx + 1) % batch == 0:
            txn.commit()
            txn = env.begin(write=True)
    txn.commit()
    env.close()
    with open(os.path.join(lmdb_path, "meta_info.txt"), "w") as f:
        f.write("\n".join(meta) + "\n")
