"""Batching data loader: thread-pool sample fetch + host->device prefetch.

Replaces the reference's torch DataLoader with 4 worker processes
(reference main.py:452-458).  At batch 8 the per-sample numpy work is
light; a thread pool + one-batch device prefetch keeps the accelerator fed
without process-spawn complexity, and batches are device_put with the data
mesh sharding so the training step never sees host arrays.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np
import jax


def collate(samples: list[dict]) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def valid_count(batch: dict) -> int:
    """Number of real (non-pad) samples in a batch produced by DataLoader
    with drop_last=False; full batch size when no padding happened."""
    mask = batch.get("valid_mask")
    if mask is None:
        return int(batch["point_clouds"].shape[0])
    return int(np.asarray(mask).sum())


def slice_valid(tree: dict, n: int) -> dict:
    """Strip pad samples (always at the tail) from every batched array."""
    return {k: v[:n] for k, v in tree.items()}


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        sharding=None,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.sharding = sharding
        self.prefetch = prefetch
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 1000003 + self._epoch)
            rng.shuffle(order)
        nb = len(self)
        for b in range(nb):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            n_valid = len(idxs)
            if n_valid < self.batch_size:
                # pad-and-mask: keep the fixed jit shape by repeating the
                # last sample; callers strip the tail via valid_count/
                # slice_valid.  The reference torch DataLoader keeps the
                # partial batch (dynamic shape) — on TPU that would force a
                # recompile, so we pad instead and mask host-side.
                pad = np.full(self.batch_size - n_valid, idxs[-1], idxs.dtype)
                idxs = np.concatenate([idxs, pad])
            yield idxs, n_valid

    def __iter__(self) -> Iterator[dict]:
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for idxs, n_valid in self._index_batches():
                    samples = list(pool.map(self.dataset.__getitem__, idxs))
                    batch = collate(samples)
                    if not self.drop_last:
                        batch["valid_mask"] = (
                            np.arange(self.batch_size) < n_valid
                        ).astype(np.float32)
                    if self.sharding is not None:
                        batch = jax.tree_util.tree_map(
                            lambda x: jax.device_put(x, self.sharding), batch
                        )
                    out_q.put(batch)
            out_q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = out_q.get()
            if item is sentinel:
                break
            yield item
        t.join()
