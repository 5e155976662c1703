"""Device timing with a readback fence.

On tunneled TPU backends ``block_until_ready`` is not a reliable fence; a
device→host scalar readback is (and the TPU executes queued programs in
order, so fetching the last result bounds the whole run).  This is the
timing methodology used by ``bench.py`` and ``tools/profile_fwd.py``.
"""

from __future__ import annotations

import time

import numpy as np


def device_timeit(fn, *args, iters=8, warmup=2):
    """Mean seconds per call of ``fn(*args)``; the result must be (or
    contain, as leaf 0) a small array to fetch."""
    import jax

    def fence(r):
        # ONE scalar, not the whole leaf: post-jit transfers run at
        # 20-40 MB/s on the tunneled backend (CLAUDE.md) — fetching a
        # full image batch would dominate the timed window
        leaf = jax.tree.leaves(r)[0]
        np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])

    for _ in range(warmup):
        fence(fn(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    fence(r)
    return (time.perf_counter() - t0) / iters
