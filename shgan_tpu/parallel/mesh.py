"""Device mesh + sharding helpers (the SPMD replacement for the reference's
process-per-GPU NCCL setup).

The reference parallelizes with one process per GPU, DDP gradient all-reduce
and explicit broadcasts (`/root/reference/lib/utils.py:271-347`,
`ds_sampler.py:9-87`, SURVEY §2.3).  On TPU the whole communication surface
collapses into compiler-inserted collectives: parameters are replicated over
the mesh, batches are sharded on the ``data`` axis, and the mean-reduction
in the loss generates the gradient all-reduce over ICI automatically.

The mesh carries a ``model`` axis (size 1 under pure data parallelism) so
tensor/spatial sharding can be enabled without API changes; the reference
has no tensor/pipeline/sequence parallelism to reproduce (SURVEY §2.3).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices=None, data=None, model=1, devices=None):
    """Create a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    dev = np.asarray(devices).reshape(data, model)
    return Mesh(dev, axis_names=("data", "model"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh):
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def local_batch_to_global(batch, mesh):
    """Multi-host: assemble a global sharded array from per-host shards.
    Single-host (this repo's default): identical to :func:`shard_batch`."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    s = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(s, x), batch)
