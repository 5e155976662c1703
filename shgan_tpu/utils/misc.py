"""Small shared helpers (reference ``stylegan_utils/misc.py:9-31`` and the
``record_function`` profiling spans of `stylegan_default_loss.py:62-127`)."""

from __future__ import annotations

import functools

import jax


def assert_shape(x, ref_shape):
    """Shape assert with None wildcards (reference misc.assert_shape,
    `misc.py:15-30`).  Static under jit — shapes are trace-time constants."""
    if x.ndim != len(ref_shape):
        raise AssertionError(
            f"Wrong number of dimensions: got {x.ndim}, "
            f"expected {len(ref_shape)}")
    for idx, (size, ref_size) in enumerate(zip(x.shape, ref_shape)):
        if ref_size is None:
            continue
        if int(size) != int(ref_size):
            raise AssertionError(
                f"Wrong size for dimension {idx}: got {size}, "
                f"expected {ref_size}")


def profiled_function(fn):
    """Wrap a function in a ``jax.named_scope`` so it shows up as a span in
    profiler traces — the role of the reference's
    ``torch.autograd.profiler.record_function``."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.named_scope(fn.__name__):
            return fn(*args, **kwargs)
    return wrapped


def constant_cache(fn):
    """Memoize trace-time constants by hashable args (the role of the
    reference's per-device ``constant(...,memo)`` caches)."""
    return functools.lru_cache(maxsize=None)(fn)
