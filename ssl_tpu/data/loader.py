"""Host-side data loading: rank-sharded sampler + threaded prefetch loader.

TPU-native replacement for the reference's DataLoader + EnlargedSampler +
prefetchers (data/data_sampler.py:21-48, prefetch_dataloader.py): each JAX
process loads only its shard (per-host input pipeline), batches are stacked
numpy arrays handed to ``jax.device_put`` by the trainer.  A CUDA-stream
prefetcher has no TPU analogue; overlap comes from the background thread +
XLA's async dispatch."""

from __future__ import annotations

import queue
import threading

import numpy as np


class EnlargedSampler:
    """Rank-strided, epoch-seeded permutation with an enlarge ratio so
    iteration-based training avoids frequent epoch boundaries (reference
    data_sampler.py:21-48)."""

    def __init__(self, num_samples: int, world_size: int = 1, rank: int = 0, ratio: int = 1):
        self.orig_num = num_samples
        self.world_size = world_size
        self.rank = rank
        self.num_per_rank = int(np.ceil(num_samples * ratio / world_size))
        self.total_size = self.num_per_rank * world_size
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def indices(self):
        g = np.random.RandomState(self.epoch)
        order = g.permutation(self.total_size) % self.orig_num
        return order[self.rank:self.total_size:self.world_size]

    def __len__(self):
        return self.num_per_rank


def collate(samples: list[dict]) -> dict:
    """Stack numpy fields into batch arrays; keep strings as lists."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, axis=0)
        elif isinstance(vals[0], (int, float, np.floating, np.integer)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Iteration-oriented loader with worker threads + prefetch queue.

    Threads (not processes) because decode/augment are numpy/cv2 which release
    the GIL; mirrors prefetch_mode='cpu' in the reference."""

    def __init__(self, dataset, batch_size: int, sampler: EnlargedSampler | None = None,
                 shuffle: bool = False, num_workers: int = 4, drop_last: bool = True,
                 prefetch: int = 4, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        n = len(self.sampler) if self.sampler else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return int(np.ceil(n / self.batch_size))

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if self.sampler:
            self.sampler.set_epoch(epoch)

    def _index_batches(self):
        if self.sampler is not None:
            idx = self.sampler.indices()
        elif self.shuffle:
            idx = np.random.RandomState(self.seed + self.epoch).permutation(len(self.dataset))
        else:
            idx = np.arange(len(self.dataset))
        nb = len(idx) // self.batch_size if self.drop_last else int(np.ceil(len(idx) / self.batch_size))
        return [idx[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)]

    def __iter__(self):
        batches = self._index_batches()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    q.put(collate([self.dataset[int(i)] for i in b]))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


def device_prefetch(iterator, n: int = 2, sharding=None):
    """Overlap host->device transfer with compute: keep `n` batches in flight
    (device_put is async; this is the TPU analogue of the reference's
    CUDAPrefetcher, prefetch_dataloader.py:82-122).

    With ``sharding`` (a NamedSharding over the batch axis) the H2D transfer
    lands directly in the mesh layout — no later reshard copy."""
    import collections
    import jax

    def to_device(batch):
        if sharding is None:
            return {k: (jax.device_put(v) if isinstance(v, np.ndarray) else v)
                    for k, v in batch.items()}
        from ssl_tpu.parallel.mesh import host_to_global
        return {k: (host_to_global(v, sharding) if isinstance(v, np.ndarray) else v)
                for k, v in batch.items()}

    queue = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(n):
            queue.append(to_device(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(to_device(next(it)))
        except StopIteration:
            pass
        yield out


def build_dataloader(dataset, dataset_opt: dict, num_gpu: int = 1, dist: bool = False,
                     sampler=None, seed: int = 0):
    """Reference-surface builder (data/__init__.py:40-94 semantics)."""
    phase = dataset_opt.get("phase", "train")
    if phase == "train":
        batch_size = dataset_opt.get("batch_size_per_gpu", 16)
        num_workers = dataset_opt.get("num_worker_per_gpu", 4)
        return DataLoader(dataset, batch_size, sampler=sampler, shuffle=sampler is None,
                          num_workers=num_workers, drop_last=True, seed=seed)
    return DataLoader(dataset, 1, shuffle=False, num_workers=1, drop_last=False, seed=seed)
