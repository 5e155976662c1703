"""Host-side data pipelines with parallel background prefetch.

The reference feeds GPUs with torch DataLoader worker processes
(`/root/reference/lib/experiments/shgan_default.py:193-201`).  Here a
thread pool builds whole batches concurrently (PIL decode and the zip
inflate release the GIL, so threads scale on multi-core TPU hosts without
forking a process that holds a live TPU runtime), results are yielded in
order, and batches are handed to JAX as mesh-sharded global arrays so host
work overlaps device compute — the "keep the TPUs fed" requirement of
BASELINE.md.

Determinism: each batch is formatted under a :func:`~.rng.batch_rng`
scope seeded from (pipeline seed, epoch, batch index), so samples are
identical for any worker count or thread scheduling — the TPU-side
equivalent of torch's deterministic per-worker seeding.
"""

from __future__ import annotations

import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor

from .sampler import DataShard


def default_num_threads(cap=8):
    try:
        n = len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        n = os.cpu_count() or 1
    return max(1, min(n, cap))


class _Prefetcher:
    """Ordered parallel prefetch over ``make_batch(0..n_batches-1)``.

    Up to ``window = max(depth, num_threads)`` batches are in flight on a
    ``num_threads``-wide pool; results yield strictly in order (the window
    bounds host memory).  ``num_threads=0`` → fully synchronous (debug).
    """

    def __init__(self, make_batch, n_batches, depth=4, num_threads=None):
        self.make_batch = make_batch
        self.n_batches = n_batches
        self.depth = depth
        self.num_threads = (default_num_threads() if num_threads is None
                            else num_threads)

    def __iter__(self):
        n = self.n_batches
        if self.num_threads <= 0:
            for b in range(n):
                yield self.make_batch(b)
            return
        window = max(self.depth, self.num_threads)
        ex = ThreadPoolExecutor(self.num_threads)
        try:
            inflight = deque()
            nxt = 0
            while nxt < min(window, n):
                inflight.append(ex.submit(self.make_batch, nxt))
                nxt += 1
            while inflight:
                batch = inflight.popleft().result()
                if nxt < n:
                    inflight.append(ex.submit(self.make_batch, nxt))
                    nxt += 1
                yield batch
        finally:
            # abandoning the iterator mid-stream (consumer exception,
            # GeneratorExit) must not block on up to `window` queued
            # batch builds — cancel what hasn't started, don't wait
            ex.shutdown(wait=False, cancel_futures=True)


def _process_shard():
    """(shard_id, num_shards) = (process_index, process_count) — each host
    builds only its own contiguous block of the global batch (SURVEY §2.3
    DistributedSampler → per-host shard)."""
    import jax
    return jax.process_index(), jax.process_count()


def _local_batch(batch_size, num_shards):
    assert batch_size % num_shards == 0, (
        f"global batch {batch_size} not divisible by "
        f"{num_shards} processes")
    return batch_size // num_shards


class EvalPipeline:
    """Sequential (shuffle=False, extend=True) evaluation pipeline matching
    the reference eval protocol (shgan_default.py:191-201).

    ``batch_size`` is GLOBAL; each process formats batch_size/process_count
    rows and the yielded (real, mask) are global mesh-sharded arrays
    (single-host: ordinary device arrays).  valid/uids are this process's
    local rows — exactly what :func:`~..parallel.local_rows` returns for
    the device outputs."""

    def __init__(self, dataset, formatter, batch_size, mesh=None, depth=4,
                 seed=0, num_threads=None, transport="f32",
                 device_image_bank=False):
        import jax
        shard_id, num_shards = _process_shard()
        self.dataset = dataset
        self.batch_size = batch_size
        self.mesh = mesh
        self.device_bank = None
        bank_map = None
        if device_image_bank:
            # upload the dataset's uint8 image bank ONCE, before any jit
            # executes (on tunneled TPU backends transfers degrade ~40×
            # once any executable has run — docs/perf_ab.json); per-batch
            # host→device traffic then drops to int32 rows + bitpacked
            # masks, and images are gathered from HBM
            if num_shards > 1:
                raise ValueError("device_image_bank is single-process "
                                 "(per-host banks would need a global "
                                 "array assembly)")
            if not hasattr(dataset, "image_bank"):
                raise ValueError(
                    f"dataset {type(dataset).__name__} has no image_bank()"
                    " — device_image_bank unsupported")
            if (getattr(formatter, "random_flip", False)
                    or getattr(formatter, "alters_pixels", False)):
                # bank mode serves the uploaded image row and DISCARDS the
                # formatter's image output — a flipping formatter, a
                # pixel-altering formatter (AdvInpainting scale+crop), or
                # any transforms pipeline would silently evaluate
                # different pixels than configured (the published eval
                # protocol is transform-free and no-flip)
                raise ValueError(
                    "device_image_bank requires a pixel-preserving "
                    "formatter with no transforms (set random_flip: "
                    "false, drop transforms, or disable "
                    "device_image_bank)")
            bank_np, bank_map = dataset.image_bank()
            from ..parallel import replicated
            sharding = replicated(mesh) if mesh is not None else None
            self.device_bank = (jax.device_put(bank_np, sharding)
                                if sharding is not None
                                else jax.device_put(bank_np))
            self.device_bank.block_until_ready()
        self.shard = DataShard(dataset, formatter,
                               _local_batch(batch_size, num_shards),
                               shard_id=shard_id, num_shards=num_shards,
                               shuffle=False, extend=True, seed=seed,
                               transport=transport, bank_map=bank_map)
        # single-process: device_put INSIDE the prefetch worker, so the
        # host→device upload of batch i+1 overlaps device compute of
        # batch i (multi-host keeps the global-array assembly on the
        # consuming thread — its construction order must match across
        # processes)
        self._put_in_worker = (mesh is not None
                               and jax.process_count() == 1)
        make = (self._worker_batch if self._put_in_worker
                else self.shard.get_batch)
        self.prefetch = _Prefetcher(make, len(self.shard),
                                    depth=depth, num_threads=num_threads)

    def _worker_batch(self, b):
        from ..parallel import shard_batch
        real, mask, valid, uids = self.shard.get_batch(b)
        real, mask = shard_batch((real, mask), self.mesh)
        return real, mask, valid, uids

    def __len__(self):
        return len(self.shard)

    def __iter__(self):
        from ..parallel import local_batch_to_global
        for real, mask, valid, uids in self.prefetch:
            if self.mesh is not None and not self._put_in_worker:
                real, mask = local_batch_to_global((real, mask), self.mesh)
            yield real, mask, valid, uids


class TrainPipeline:
    """Infinite shuffled pipeline (re-shuffles each epoch with a new seed,
    like the per-epoch rank-0 randperm at ds_sampler.py:74-83).  Global
    ``batch_size``; per-process shards as in :class:`EvalPipeline`."""

    def __init__(self, dataset, formatter, batch_size, mesh=None, depth=4,
                 seed=0, num_threads=None):
        self.shard_id, self.num_shards = _process_shard()
        self.dataset = dataset
        self.formatter = formatter
        self.batch_size = batch_size
        self.local_bs = _local_batch(batch_size, self.num_shards)
        self.mesh = mesh
        self.depth = depth
        self.seed = seed
        self.num_threads = num_threads

    def __iter__(self):
        from ..parallel import local_batch_to_global
        epoch = 0
        while True:
            shard = DataShard(self.dataset, self.formatter, self.local_bs,
                              shard_id=self.shard_id,
                              num_shards=self.num_shards,
                              shuffle=True, seed=self.seed + epoch,
                              extend=False, drop_last=True, epoch=epoch)
            pf = _Prefetcher(shard.get_batch, len(shard), depth=self.depth,
                             num_threads=self.num_threads)
            for real, mask, _valid, _uids in pf:
                if self.mesh is not None:
                    real, mask = local_batch_to_global((real, mask),
                                                       self.mesh)
                yield real, mask
            epoch += 1
