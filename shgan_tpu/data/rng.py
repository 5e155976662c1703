"""Thread-local RNG for the host data path.

The reference's data factory draws masks/flips/crops from the *global*
``np.random`` inside DataLoader worker processes, each deterministically
seeded (torch seeds workers base_seed+worker_id) — reproducible because
workers are processes.  Our pipeline parallelizes with THREADS (no fork
after JAX init, zero-copy batches), so the global RNG would make sample
randomness depend on thread scheduling.

``R`` is an ``np.random``-compatible proxy: inside a :func:`batch_rng`
scope it delegates to a thread-local ``RandomState`` (the pipeline seeds
one per batch from (pipeline seed, batch index) — same samples regardless
of worker count or scheduling); outside any scope it falls through to the
global ``np.random``, preserving bit-identity with the reference protocol
for direct calls (tests seed ``np.random`` and compare sequences).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

import numpy as np

_TLS = threading.local()


class _RNGProxy:
    __slots__ = ()

    @staticmethod
    def _rng():
        return getattr(_TLS, "rng", None) or np.random

    def __getattr__(self, name):
        return getattr(self._rng(), name)


R = _RNGProxy()


_M64 = (1 << 64) - 1


def derive_seed(seed, batch_idx, epoch=0):
    """Deterministic per-batch seed (SplitMix-style mix so nearby
    (seed, epoch, batch) tuples land far apart)."""
    x = (seed * 0x9E3779B97F4A7C15
         + epoch * 0xBF58476D1CE4E5B9
         + batch_idx * 0x94D049BB133111EB) & _M64
    x = ((x ^ (x >> 31)) * 0xD6E8FEB86659FD93) & _M64
    return (x ^ (x >> 27)) & 0x7FFFFFFF


@contextmanager
def batch_rng(seed):
    """Scope with a fresh thread-local RandomState(seed); ``None`` →
    global ``np.random`` (the bit-identical protocol path)."""
    old = getattr(_TLS, "rng", None)
    _TLS.rng = np.random.RandomState(seed) if seed is not None else None
    try:
        yield
    finally:
        _TLS.rng = old
