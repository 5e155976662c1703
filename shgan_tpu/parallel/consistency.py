"""Cross-device replication consistency check.

The reference intends to hash-compare DDP parameters across ranks
(`/root/reference/lib/experiments/stylegan_default.py:189-190` — dead code,
its ``misc`` module is missing).  Under SPMD the replicas are XLA's
responsibility, but after host-side surgery (checkpoint loads, manual
device_puts) a skewed replica is still possible; this check reads each
device's shard of nominally-replicated arrays and compares.
"""

from __future__ import annotations

import numpy as np
import jax


def check_replicated(tree, atol=0.0, max_report=5):
    """Assert every leaf of a replicated pytree is identical on all devices.

    Returns the number of leaves checked.  Raises AssertionError listing the
    first ``max_report`` mismatched paths.
    """
    mismatches = []
    count = 0

    def visit(path, leaf):
        nonlocal count
        if not isinstance(leaf, jax.Array) or not hasattr(leaf, "sharding"):
            return
        shards = leaf.addressable_shards
        if len(shards) <= 1:
            count += 1
            return
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            if ref.shape != s.data.shape:
                mismatches.append((jax.tree_util.keystr(path),
                                   "sharded (not replicated)"))
                break
            if not np.allclose(ref, np.asarray(s.data), atol=atol, rtol=0):
                mismatches.append((jax.tree_util.keystr(path),
                                   f"device {s.device} differs"))
                break
        count += 1

    jax.tree_util.tree_map_with_path(visit, tree)
    if mismatches:
        lines = "\n".join(f"  {p}: {why}" for p, why in
                          mismatches[:max_report])
        raise AssertionError(
            f"{len(mismatches)} replicated leaves inconsistent across "
            f"devices:\n{lines}")
    return count
