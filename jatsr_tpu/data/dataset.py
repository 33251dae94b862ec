"""Latent dataset + batch loader (the reference's DataLoader path).

Mirrors LatentDataset / ValidationDataset semantics
(train_ddp_v3mod2.py:476-597): per-song fp16 latents memory-mapped, an
epoch multiplier, loop-padding for short songs, random crops for training
and deterministic spread crops for validation; fp16 -> fp32 conversion only
after cropping.

The reference needs 16 DataLoader worker processes per GPU; here cropping a
[1378, 1024] fp16 view is a single mmap slice + cast, done either inline or
on the background prefetch thread of ``BatchLoader`` (double-buffered so
host work overlaps device steps).  A C++ loader (native/) can slot in for
multi-stream deployments.
"""

from __future__ import annotations

import json
import math
import threading
import queue as queue_mod
from pathlib import Path
from typing import Iterator, Tuple

import numpy as np



def load_stats(path: str):
    """Load normalization stats JSON -> (hr_mean, hr_std, lr_mean, lr_std)
    float32 [C] (ref train_ddp_v3mod2.py:459-470)."""
    with open(path) as f:
        d = json.load(f)
    return tuple(
        np.asarray(d[k], np.float32)
        for k in ("hr_mean", "hr_std", "lr_mean", "lr_std")
    )


class _LatentFiles:
    def __init__(self, data_dir: str, split: str):
        self.files = sorted(Path(data_dir, split).glob("*.hr.npy"))
        if not self.files:
            raise ValueError(f"no *.hr.npy under {data_dir}/{split}")
        self._cache = {}

    def __len__(self):
        return len(self.files)

    def get(self, idx: int):
        """mmap views (hr, lr) [T, C] fp16; views are cached (cheap)."""
        if idx not in self._cache:
            hr_path = self.files[idx]
            hr = np.load(hr_path, mmap_mode="r")
            lr = np.load(str(hr_path).replace(".hr.npy", ".lr.npy"),
                         mmap_mode="r")
            self._cache[idx] = (hr, lr)
        return self._cache[idx]


def _crop_or_loop(hr, lr, start: int, target: int):
    length = hr.shape[0]
    if length < target:
        reps = math.ceil(target / length)
        hr = np.tile(np.asarray(hr), (reps, 1))[:target]
        lr = np.tile(np.asarray(lr), (reps, 1))[:target]
    else:
        hr = np.asarray(hr[start : start + target])
        lr = np.asarray(lr[start : start + target])
    return hr.astype(np.float32), lr.astype(np.float32)


class LatentDataset:
    """Training dataset: random crops, x`multiplier` samples per epoch."""

    def __init__(self, data_dir: str, split: str = "train",
                 target_frames: int = 1378, multiplier: int = 6,
                 seed: int = 0):
        self.store = _LatentFiles(data_dir, split)
        self.target = target_frames
        self.multiplier = multiplier
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.store) * self.multiplier

    def sample_plan(self, idx: int) -> Tuple[int, int]:
        """(file_idx, crop_start) for sample ``idx`` — shared by the Python
        and native batch paths.

        Crop positions are a pure function of (seed, epoch, idx): resuming a
        run at an epoch boundary reproduces the exact crop sequence.  (The
        reference needs to checkpoint/restore the numpy RNG state for the
        same guarantee, train_ddp_v3mod2.py:1129-1135.)
        """
        file_idx = idx % len(self.store)
        hr, _ = self.store.get(file_idx)
        length = hr.shape[0]
        if length <= self.target:
            return file_idx, 0
        mix = (self.seed * 1_000_003 + self.epoch * 9_176 + idx) % (2**31 - 1)
        start = np.random.RandomState(mix).randint(
            0, length - self.target + 1
        )
        return file_idx, int(start)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        file_idx, start = self.sample_plan(idx)
        hr, lr = self.store.get(file_idx)
        return _crop_or_loop(hr, lr, start, self.target)


class ValidationDataset:
    """Deterministic crops spread uniformly across each song
    (ref train_ddp_v3mod2.py:561-597)."""

    def __init__(self, data_dir: str, split: str = "val",
                 target_frames: int = 1378, multiplier: int = 6):
        self.store = _LatentFiles(data_dir, split)
        self.target = target_frames
        self.multiplier = multiplier

    def __len__(self):
        return len(self.store) * self.multiplier

    def sample_plan(self, idx: int) -> Tuple[int, int]:
        file_idx = idx % len(self.store)
        sample_idx = idx // len(self.store)
        hr, _ = self.store.get(file_idx)
        length = hr.shape[0]
        if length <= self.target:
            start = 0
        elif self.multiplier == 1:
            start = (length - self.target) // 2
        else:
            seg = max(length - self.target, 1)
            start = min(
                int(seg * sample_idx / (self.multiplier - 1)),
                length - self.target,
            )
        return file_idx, start

    def __getitem__(self, idx: int):
        file_idx, start = self.sample_plan(idx)
        hr, lr = self.store.get(file_idx)
        return _crop_or_loop(hr, lr, start, self.target)


class BatchLoader:
    """Batched iterator with optional background prefetch.

    Yields (hr, lr) float32 [B, T, C].  ``shuffle`` permutes sample indices
    per epoch (the DistributedSampler.set_epoch equivalent is
    ``set_epoch``, which reseeds the permutation).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, prefetch: int = 2,
                 native: bool = False, native_threads: int = 4,
                 transform=None, shard=None):
        """``transform(hr, lr) -> (hr, lr)`` runs on the prefetch thread —
        pass a device_put there so host->device transfers overlap device
        compute (the torch DataLoader's pin_memory+non_blocking analogue).

        ``shard=(process_index, process_count)``: multi-host mode — every
        host computes the identical global batch order (shuffle/crops are
        pure functions of (seed, epoch, idx)) but materialises only its
        contiguous span of each batch; ``batch_size`` stays the GLOBAL
        batch.  The reference gets this from DistributedSampler
        (train_ddp_v3mod2.py:826-835)."""
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.prefetch = prefetch
        self.transform = transform
        self.shard = shard
        if shard is not None:
            pid, n = shard
            if batch_size % n:
                raise ValueError(
                    f"global batch {batch_size} must divide by "
                    f"process count {n}"
                )
            if not drop_last:
                raise ValueError("sharded loading requires drop_last")
            assert 0 <= pid < n, shard
        self._native_store = None
        if native:
            from .native_loader import NativeLatentStore, is_available

            if not is_available():
                from .native_loader import build_error

                raise RuntimeError(
                    f"native loader requested but unavailable: {build_error()}"
                )
            self._native_store = NativeLatentStore(
                [str(p) for p in dataset.store.files],
                n_threads=native_threads,
            )

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.ds, "set_epoch"):
            self.ds.set_epoch(epoch)

    def __len__(self):
        n = len(self.ds)
        return n // self.bs if self.drop_last else math.ceil(n / self.bs)

    def _indices(self):
        idx = np.arange(len(self.ds))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        return idx

    def _assemble(self, batch_idx) -> Tuple[np.ndarray, np.ndarray]:
        if self._native_store is not None:
            plans = [self.ds.sample_plan(int(i)) for i in batch_idx]
            file_idx = np.asarray([p[0] for p in plans], np.int64)
            starts = np.asarray([p[1] for p in plans], np.int64)
            hr, lr = self._native_store.fill_batch(
                file_idx, starts, self.ds.target
            )
        else:
            samples = [self.ds[int(i)] for i in batch_idx]
            hr = np.stack([s[0] for s in samples])
            lr = np.stack([s[1] for s in samples])
        if self.transform is not None:
            hr, lr = self.transform(hr, lr)
        return hr, lr

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = self._indices()
        batches = [
            idx[i : i + self.bs] for i in range(0, len(idx), self.bs)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.bs]
        if self.shard is not None:
            pid, n = self.shard
            per = self.bs // n
            batches = [b[pid * per : (pid + 1) * per] for b in batches]
        if self.prefetch <= 0:
            for b in batches:
                yield self._assemble(b)
            return

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in batches:
                    q.put(self._assemble(b))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
