"""Orbax checkpoint save/load for training state.

Replaces the reference's pickle snapshots
(`/root/reference/lib/experiments/stylegan_default.py:506-532`) with Orbax's
async-capable, sharding-aware checkpoint format (the TPU-native choice:
restores respect the device mesh placement).
"""

from __future__ import annotations

import os.path as osp

import jax


def save_checkpoint(path, state):
    import orbax.checkpoint as ocp
    path = osp.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_checkpoint(path, like=None):
    import orbax.checkpoint as ocp
    path = osp.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like) \
                if hasattr(ocp.utils, "to_shape_dtype_struct") else like
            return ckptr.restore(path, target)
        return ckptr.restore(path)
