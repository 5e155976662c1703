"""Host-side data pipelines with background prefetch.

The reference feeds GPUs with torch DataLoader worker processes
(`/root/reference/lib/experiments/shgan_default.py:193-201`).  Here a thread
pool decodes/masks ahead of the accelerator and batches are handed to JAX as
mesh-sharded global arrays, so host work overlaps device compute — the
"keep the TPUs fed" requirement of BASELINE.md.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from .sampler import DataShard


class _Prefetcher:
    """Runs an iterable on a daemon thread pool, keeping ``depth`` batches
    ready."""

    def __init__(self, make_iter, depth=4, num_threads=None):
        self.make_iter = make_iter
        self.depth = depth

    def __iter__(self):
        q = queue.Queue(maxsize=self.depth)
        stop = object()

        def worker():
            try:
                for item in self.make_iter():
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


class EvalPipeline:
    """Sequential (shuffle=False, extend=True) evaluation pipeline matching
    the reference eval protocol (shgan_default.py:191-201)."""

    def __init__(self, dataset, formatter, batch_size, mesh=None, depth=4,
                 seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.mesh = mesh
        self.shard = DataShard(dataset, formatter, batch_size, shuffle=False,
                               extend=True, seed=seed)
        self.prefetch = _Prefetcher(lambda: iter(self.shard), depth=depth)

    def __len__(self):
        return len(self.shard)

    def __iter__(self):
        from ..parallel import shard_batch
        for real, mask, valid, uids in self.prefetch:
            if self.mesh is not None:
                real, mask = shard_batch((real, mask), self.mesh)
            yield real, mask, valid, uids


class TrainPipeline:
    """Infinite shuffled pipeline (re-shuffles each epoch with a new seed,
    like the per-epoch rank-0 randperm at ds_sampler.py:74-83)."""

    def __init__(self, dataset, formatter, batch_size, mesh=None, depth=4,
                 seed=0):
        self.dataset = dataset
        self.formatter = formatter
        self.batch_size = batch_size
        self.mesh = mesh
        self.depth = depth
        self.seed = seed

    def __iter__(self):
        from ..parallel import shard_batch
        epoch = 0
        while True:
            shard = DataShard(self.dataset, self.formatter, self.batch_size,
                              shuffle=True, seed=self.seed + epoch,
                              extend=False, drop_last=True)
            for real, mask, _valid, _uids in _Prefetcher(
                    lambda s=shard: iter(s), depth=self.depth):
                if self.mesh is not None:
                    real, mask = shard_batch((real, mask), self.mesh)
                yield real, mask
            epoch += 1
