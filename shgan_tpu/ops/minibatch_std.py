"""Minibatch standard-deviation layer for the discriminator epilogue.

Reference: ``minibatch_std_layer`` at
`/root/reference/lib/model_zoo/stylegan.py:686-705`.  Appends per-group
feature-statistics channels so the discriminator can detect mode collapse.

SPMD note: under data parallelism the group statistics are computed over the
*per-device* batch shard, which matches the reference's per-GPU behavior
under DDP (no cross-device sync of minibatch std).
"""

from __future__ import annotations

import jax.numpy as jnp


def minibatch_std(x, group_size=4, num_channels=1):
    """x: [N, C, H, W] → [N, C + num_channels, H, W]."""
    N, C, H, W = x.shape
    G = min(group_size, N) if group_size is not None else N
    F = num_channels
    c = C // F
    y = x.reshape(G, -1, F, c, H, W)          # [G n F c H W]
    y = y - y.mean(axis=0)                     # subtract group mean
    y = jnp.square(y).mean(axis=0)             # variance over group
    y = jnp.sqrt(y + 1e-8)                     # stddev
    y = y.mean(axis=(2, 3, 4))                 # [n F]
    y = y.reshape(-1, F, 1, 1)
    y = jnp.tile(y, (G, 1, H, W))              # [N F H W]
    return jnp.concatenate([x, y.astype(x.dtype)], axis=1)
