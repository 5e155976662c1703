"""Cross-device replication check (parallel/consistency.py — the DDP
hash-compare the reference left dead, stylegan_default.py:189-190)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shgan_tpu.parallel import (create_mesh, replicated, shard_batch,
                                check_replicated)


def test_replicated_tree_passes():
    mesh = create_mesh(4)
    tree = {"a": jnp.ones((8, 8)), "b": {"c": jnp.arange(6.0)}}
    tree = jax.device_put(tree, replicated(mesh))
    assert check_replicated(tree) == 2


def test_skewed_replica_detected():
    mesh = create_mesh(4)
    devices = list(mesh.devices.reshape(-1))
    # hand-build a "replicated" array whose shards differ
    import jax.sharding as shd
    s = shd.NamedSharding(mesh, shd.PartitionSpec())
    parts = [jax.device_put(jnp.full((4, 4), float(i == 2)), d)
             for i, d in enumerate(devices)]
    skewed = jax.make_array_from_single_device_arrays((4, 4), s, parts)
    with pytest.raises(AssertionError, match="inconsistent"):
        check_replicated({"w": skewed})


def test_sharded_array_flagged():
    mesh = create_mesh(4)
    (batch,) = shard_batch((np.arange(32, dtype=np.float32)
                            .reshape(8, 4),), mesh)
    with pytest.raises(AssertionError):
        check_replicated({"x": batch})


@pytest.mark.slow
def test_flagship_shape_virtual_mesh():
    """512² shgan_g512_small SPMD forward + train step on the virtual
    mesh (VERDICT r2 #9): sharding correctness at real spatial shapes.
    Runs in the dryrun's self-pinned subprocess (2 virtual devices — the
    8-participant CPU collectives are fragile on this 1-core box)."""
    import os.path as osp
    import sys
    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    import __graft_entry__ as g
    g.dryrun_multichip(2, flagship=True)
