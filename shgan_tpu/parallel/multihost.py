"""Multi-host (multi-process) execution helpers.

The reference is single-node multi-GPU (mp.spawn + NCCL,
`/root/reference/main.py:72-89`, `utils.py:304-309`); the TPU-native
equivalent of growing beyond one node is multi-*process* JAX over DCN:
``jax.distributed.initialize`` + one contiguous data shard per process,
assembled into global arrays with ``make_array_from_process_local_data``
(SURVEY §2.3 "TPU-equivalent" column).  Conventions:

* every process computes identical replicated values (configs, params,
  z/noise key streams) from the shared seed — nothing to broadcast;
* per-process data shards are contiguous in the global order, so
  concatenating host-gathered rows in process order restores dataset order
  (the reference's ``zipzap_arrange`` interleave is unnecessary);
* process 0 is the writer (logs, checkpoints, result.json) — the
  reference's RANK==0 convention.
"""

from __future__ import annotations

import os

import numpy as np


def maybe_initialize_distributed():
    """Call ``jax.distributed.initialize`` when the environment names a
    coordinator.  Recognized (first match wins):

    * ``SHGAN_DIST_COORDINATOR`` + ``SHGAN_DIST_NPROCS`` +
      ``SHGAN_DIST_PID`` — explicit, used by the multi-process tests;
    * ``JAX_COORDINATOR_ADDRESS`` (+ ``JAX_NUM_PROCESSES`` /
      ``JAX_PROCESS_ID``) — the standard JAX names; on Cloud TPU pods the
      argless auto-detect path handles the rest.

    Must run before any other JAX API touches the backend.  Returns
    (process_index, process_count).
    """
    import jax

    coord = os.environ.get("SHGAN_DIST_COORDINATOR")
    if coord:
        nprocs = int(os.environ["SHGAN_DIST_NPROCS"])
        pid = int(os.environ["SHGAN_DIST_PID"])
        jax.distributed.initialize(coord, nprocs, pid)
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def is_lead():
    """True on the writer process (reference RANK == 0 convention)."""
    import jax
    return jax.process_index() == 0


def local_rows(arr):
    """Host rows of a (possibly multi-host global) batch-sharded array.

    Fully-addressable arrays (single host) read back whole; otherwise the
    addressable shards are concatenated in global-index order, which is
    exactly the row block this process fed via
    ``make_array_from_process_local_data``.
    """
    import jax

    if not isinstance(arr, jax.Array) or arr.is_fully_addressable:
        return np.asarray(arr)
    # Assemble by global index rather than concatenating shards: with a
    # >1 'model' axis (spatial sharding) or replicated outputs, several
    # local devices hold the SAME batch rows (naive concat counts each
    # row once per replica), and an H-sharded output splits one row block
    # across devices (concat along batch would be shape-wrong).  Writing
    # every shard into its index region handles both: replicas overwrite
    # with identical data, inner-dim shards tile their slots.
    shards = arr.addressable_shards
    starts = [(s.index[0].start or 0) for s in shards]
    stops = [(s.index[0].stop if s.index[0].stop is not None
              else arr.shape[0]) for s in shards]
    lo, hi = min(starts), max(stops)
    out = np.empty((hi - lo,) + arr.shape[1:], arr.dtype)
    for s in shards:
        ix = list(s.index)
        b = ix[0]
        ix[0] = slice((b.start or 0) - lo,
                      (b.stop if b.stop is not None else arr.shape[0]) - lo)
        out[tuple(ix)] = np.asarray(s.data)
    return out


def allgather_rows(arr):
    """Concatenate per-process ``[n_p, ...]`` host arrays across processes
    in process order (contiguous shards → global dataset order).  Row
    counts may differ per process (validity-masked rows).

    Rows ride the gather as raw bytes, so every dtype survives bit-exactly
    — in particular the float64 Inception feature banks (FID covariance is
    precision-sensitive at 50k samples) and bool validity rows, which a
    device-dtype transport would silently downcast to float32 / uint8.
    """
    import jax

    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils as mhu

    arr = np.asarray(arr)
    dtype, tail = arr.dtype, arr.shape[1:]
    n = arr.shape[0]
    row_elems = int(np.prod(tail, dtype=np.int64)) if tail else 1
    rows = np.ascontiguousarray(arr).reshape(n, row_elems).view(np.uint8)
    counts = np.asarray(mhu.process_allgather(
        np.asarray([n], np.int32))).reshape(-1)
    m = int(counts.max())
    if m == 0:
        return arr[:0]
    if n < m:
        rows = np.concatenate(
            [rows, np.zeros((m - n, rows.shape[1]), np.uint8)], axis=0)
    gathered = np.asarray(mhu.process_allgather(rows))  # [P, m, row_bytes]
    out = np.concatenate(
        [gathered[p, :counts[p]] for p in range(len(counts))], axis=0)
    return out.view(dtype).reshape((out.shape[0],) + tail)
