"""ctypes binding for the native batch mask generator (src/maskgen.cpp).

Generates CoModGAN freeform masks (`/root/reference/lib/data_factory/
ds_ffhq.py:199-217` semantics) for a whole batch in parallel C++ threads —
the host-side hot loop of the training/eval data path.  Falls back to the
pure-numpy implementation in :mod:`shgan_tpu.data.masks` if the native
build is unavailable.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_ERR = None

_SRC = os.path.join(os.path.dirname(__file__), "src", "maskgen.cpp")


def _load():
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    if os.environ.get("SHGAN_DISABLE_NATIVE") == "1":
        _LIB_ERR = RuntimeError("disabled via SHGAN_DISABLE_NATIVE")
        return None
    try:
        from .build import get_plugin
        lib = get_plugin("shgan_maskgen", [_SRC])
        assert lib.shgan_native_abi_version() == 1
        lib.shgan_random_mask_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_uint64, ctypes.c_int32]
        lib.shgan_random_mask_batch.restype = ctypes.c_int32
        _LIB = lib
    except Exception as e:  # noqa: BLE001
        _LIB_ERR = e
    return _LIB


def native_available():
    return _load() is not None


def random_mask_batch(n, s, hole_range=(0.0, 1.0), seed=0, num_threads=0,
                      impl="auto"):
    """Batch of freeform masks, float32 ``[n, 1, s, s]``, 1 = keep.

    impl: "native" (require C++), "numpy" (force fallback), or "auto".
    """
    if impl not in ("auto", "native", "numpy"):
        raise ValueError(impl)
    lib = _load() if impl != "numpy" else None
    if lib is None:
        if impl == "native":
            raise RuntimeError(f"native maskgen unavailable: {_LIB_ERR}")
        from ..data.masks import random_mask
        from ..data.rng import batch_rng
        # drive the SAME RNG random_mask reads: a batch_rng scope installs
        # a thread-local RandomState the _R proxy prefers over global
        # np.random — seeding only the global RNG would be silently
        # ignored inside a pipeline batch scope, and touching global
        # state from worker threads races anyway
        with batch_rng(seed & 0x7FFFFFFF):
            out = np.stack([random_mask(s, hole_range) for _ in range(n)])
        return out

    if num_threads <= 0:
        # C++ hardware_concurrency ignores cgroup/affinity limits; use the
        # scheduler-visible CPU count (oversubscription thrashes the 512²
        # per-thread buffers out of cache).
        try:
            num_threads = len(os.sched_getaffinity(0))
        except AttributeError:  # non-Linux
            num_threads = os.cpu_count() or 1
    out = np.empty((n, 1, s, s), dtype=np.float32)
    rc = lib.shgan_random_mask_batch(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int32(s),
        ctypes.c_float(hole_range[0]), ctypes.c_float(hole_range[1]),
        ctypes.c_uint64(seed), ctypes.c_int32(num_threads))
    if rc == 2:
        raise RuntimeError(
            f"hole_range {tuple(hole_range)} not satisfied within the "
            "native attempt cap (10000) for some mask — the acceptance "
            "probability of this range at this resolution is effectively "
            "zero (the numpy impl would loop forever)")
    if rc != 0:
        raise RuntimeError(f"shgan_random_mask_batch rc={rc}")
    return out
