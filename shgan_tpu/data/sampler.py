"""Deterministic data sharding replacing the reference DistributedSampler.

The reference splits indices evenly across ranks, padding from the front
when ``extend=True`` or truncating otherwise, and broadcasts the rank-0
shuffle order over NCCL (`/root/reference/lib/data_factory/common/
ds_sampler.py:9-87`).  Under single-controller JAX there is nothing to
broadcast: every host derives the same order from the same seed, takes its
own contiguous shard, and per-batch validity masks replace the "extend"
padding when exact counts matter (evaluators drop padded rows by mask).
"""

from __future__ import annotations

import numpy as np


def shard_indices(n, shard_id=0, num_shards=1, shuffle=False, seed=0,
                  extend=True):
    """Return (indices, valid) for this shard.

    extend=True pads the global order from its own front so every shard has
    ceil(n/num_shards) entries (ds_sampler.py:58-68); ``valid`` marks the
    non-padded entries.
    """
    order = np.arange(n, dtype=np.int64)
    if shuffle:
        order = np.random.RandomState(seed).permutation(n).astype(np.int64)
    valid = np.ones(n, dtype=bool)
    per = -(-n // num_shards)  # ceil
    total = per * num_shards
    if total > n:
        if extend:
            pad = total - n
            order = np.concatenate([order, order[:pad]])
            valid = np.concatenate([valid, np.zeros(pad, dtype=bool)])
        else:
            per = n // num_shards
            order = order[: per * num_shards]
            valid = valid[: per * num_shards]
    return (order[shard_id * per:(shard_id + 1) * per],
            valid[shard_id * per:(shard_id + 1) * per])


class DataShard:
    """Iterable over a dataset shard in fixed-size batches with a validity
    mask; the last batch is padded by repeating the final element so shapes
    stay static for jit.

    ``get_batch(b)`` is thread-safe and deterministic: each sample formats
    under a per-(seed, epoch, global position) RNG scope (see data/rng.py),
    so the stream is identical for any worker-thread count AND any shard
    (process) count — shard p's positions are offset by its contiguous
    block in the global order."""

    def __init__(self, dataset, formatter, batch_size, shard_id=0,
                 num_shards=1, shuffle=False, seed=0, extend=True,
                 drop_last=False, epoch=0, transport="f32", bank_map=None):
        self.dataset = dataset
        self.formatter = formatter
        self.batch_size = batch_size
        self.seed = seed
        self.epoch = epoch
        # 'u8': batches leave the host as uint8 (real 0..255, mask {0,1});
        # normalization happens on device (models/infer.py) — 4× fewer
        # host→device bytes, bit-identical for uint8-sourced images
        assert transport in ("f32", "u8"), transport
        self.transport = transport
        # device-image-bank mode: images live in HBM (uploaded once by the
        # pipeline); batches carry only int32 bank rows + BITPACKED masks
        # (~30× fewer bytes/batch) — formatter still runs for its mask RNG
        # stream, its image output is ignored (requires flip-free eval
        # formatters, the published protocol)
        self.bank_map = bank_map
        self.indices, self.valid = shard_indices(
            len(dataset), shard_id, num_shards, shuffle, seed, extend)
        # contiguous global offset of this shard (shards are equal-length
        # under extend=True), so per-sample RNG seeds are shard-invariant
        self.global_offset = shard_id * len(self.indices)
        if drop_last:
            k = (len(self.indices) // batch_size) * batch_size
            self.indices, self.valid = self.indices[:k], self.valid[:k]

    def __len__(self):
        return -(-len(self.indices) // self.batch_size)

    def get_batch(self, b):
        from .rng import batch_rng, derive_seed
        bs = self.batch_size
        idx = self.indices[b * bs:(b + 1) * bs]
        val = self.valid[b * bs:(b + 1) * bs]
        if len(idx) < bs:  # pad final batch to static shape
            pad = bs - len(idx)
            idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
            val = np.concatenate([val, np.zeros(pad, dtype=bool)])
        if self.bank_map is not None:
            masks, uids = [], []
            for j, i in enumerate(idx):
                pos = self.global_offset + b * bs + j
                with batch_rng(derive_seed(self.seed, pos, self.epoch)):
                    _, m, u = self.formatter(self.dataset[int(i)])
                masks.append(np.asarray(m) > 0.5)
                uids.append(u)
            packed = np.packbits(np.stack(masks)[:, None], axis=-1)
            return (self.bank_map[idx].astype(np.int32), packed, val, uids)

        u8 = self.transport == "u8"
        reals, masks, uids = [], [], []
        for j, i in enumerate(idx):
            pos = self.global_offset + b * bs + j
            with batch_rng(derive_seed(self.seed, pos, self.epoch)):
                r, m, u = self.formatter(self.dataset[int(i)])
            r = np.asarray(r)
            if u8:
                if r.dtype != np.uint8:
                    # exact inverse of the device-side u/127.5-1 for
                    # images that were uint8 to begin with
                    r = np.clip(np.rint((r.astype(np.float32) + 1.0)
                                        * 127.5), 0, 255).astype(np.uint8)
                reals.append(r)
                masks.append(np.asarray(m) > 0.5)
            else:
                if r.dtype == np.uint8:  # u8 fast-path formatter output
                    r = r.astype(np.float32) / 127.5 - 1.0
                reals.append(r.astype(np.float32, copy=False))
                masks.append(np.asarray(m, np.float32))
            uids.append(u)
        real = np.stack(reals)
        mask = np.stack(masks)[:, None]
        if u8:
            mask = mask.astype(np.uint8)
        return (real, mask, val, uids)

    def __iter__(self):
        for b in range(len(self)):
            yield self.get_batch(b)
