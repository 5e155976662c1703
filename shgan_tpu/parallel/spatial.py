"""Spatial (height) sharding of the high-resolution conv levels over the
mesh's ``model`` axis.

The full-size channel plan starves the MXU at 1024² (32 channels — 25%
lane fill, 13% single-chip MFU; docs/perf_ab.json), and a single chip's
HBM caps the batch at 512².  The TPU-native lever is to *split the
feature maps spatially across chips*: activations at resolutions ≥ a
threshold get a ``jax.lax.with_sharding_constraint`` placing H on the
``model`` axis, and XLA's SPMD partitioner (GSPMD) inserts the halo
exchanges the 3×3 convs and FIR resamplers need — we annotate, the
compiler lays the ``ppermute``/``collective-permute`` on ICI.  This is
deliberately NOT a hand-written halo kernel: GSPMD's spatial
partitioning of convolutions is the compiler path the hardware guide
prescribes, and it composes with the ``data`` axis (batch) untouched.

Usage (inside or outside jit — constraints are recorded at trace time)::

    mesh = create_mesh(8, model=4)        # ('data', 'model') = (2, 4)
    with spatial_sharding(mesh, min_res=512):
        img = G(params, x, z, ...)        # ≥512² activations H-sharded

No-op when inactive (the default) or when the mesh's model axis is 1, so
model code calls :func:`constrain` unconditionally.

The reference has no counterpart (single-GPU memory only bounds its
1024² experiments, `/root/reference/lib/data_factory/ds_openimages.py`);
this is new TPU-first capability, scaling design in docs/scaling.md.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

_STATE = threading.local()


@contextmanager
def spatial_sharding(mesh, min_res=512):
    """Activate height-sharding constraints for NCHW activations whose
    spatial extent is ≥ ``min_res`` (and divisible by the model-axis
    size)."""
    prev = getattr(_STATE, "cfg", None)
    _STATE.cfg = (mesh, int(min_res))
    try:
        yield
    finally:
        _STATE.cfg = prev


def active():
    cfg = getattr(_STATE, "cfg", None)
    if cfg is None:
        return None
    mesh, min_res = cfg
    if mesh.shape.get("model", 1) <= 1:
        return None
    return mesh, min_res


def constrain(x):
    """H-shard an NCHW activation over the model axis when the context is
    active and the shape qualifies; identity otherwise.  Safe to call on
    any array (non-4D and small tensors pass through)."""
    cfg = active()
    if cfg is None or getattr(x, "ndim", 0) != 4:
        return x
    mesh, min_res = cfg
    m = mesh.shape["model"]
    h = x.shape[2]
    if h < min_res or h % m != 0:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", None, "model", None)))
