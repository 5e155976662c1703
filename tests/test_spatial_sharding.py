"""Spatial (height) sharding over the mesh 'model' axis
(parallel/spatial.py): GSPMD-partitioned forward must match the
unsharded forward exactly — XLA inserts the halo exchanges for the 3x3
convs and FIR resamplers; we only annotate (VERDICT r2 weak #1: the
TPU-native lever for the MXU-starved 1024² level).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from shgan_tpu.parallel import create_mesh, replicated, shard_batch
from shgan_tpu.parallel.spatial import spatial_sharding, constrain
from shgan_tpu.models import get_model
from shgan_tpu.runtime.config import model_cfg_bank


def test_constrain_noop_when_inactive():
    x = jnp.ones((2, 3, 64, 64))
    assert constrain(x) is x
    assert constrain(None) is None
    mesh = create_mesh(4)  # model axis size 1
    with spatial_sharding(mesh, min_res=32):
        assert constrain(x) is x  # model=1 → inactive


def test_constrain_skips_small_and_indivisible():
    mesh = create_mesh(4, model=4)
    with spatial_sharding(mesh, min_res=64):
        small = jnp.ones((2, 3, 32, 32))
        assert constrain(small) is small          # below threshold
        odd = jnp.ones((2, 3, 66, 66))
        assert constrain(odd) is odd              # 66 % 4 != 0
        ok = jnp.ones((8, 3, 64, 64))
        out = constrain(ok)
        assert out.shape == ok.shape


@pytest.mark.slow
def test_spatially_sharded_generator_matches_unsharded():
    """Full generator (encoder + SHU + synthesis) at 256²-small with every
    ≥64² level H-sharded over a 4-way model axis: outputs must match the
    unsharded run (fp32; GSPMD halo exchange correctness end to end)."""
    cfg = model_cfg_bank()("shgan_g256_small")
    G = get_model(cfg)
    params = G.init(jax.random.key(0))

    rng = np.random.RandomState(0)
    n = 4
    real = rng.randn(n, 3, 256, 256).astype(np.float32)
    mask = (rng.rand(n, 1, 256, 256) > 0.5).astype(np.float32)
    x = np.concatenate([mask - 0.5, real * mask], axis=1)
    z = rng.randn(n, G.z_dim).astype(np.float32)

    def fwd(p, x, z):
        return G(p, x, z, noise_mode="const")

    want = np.asarray(jax.jit(fwd)(params, jnp.asarray(x), jnp.asarray(z)))

    mesh = create_mesh(8, model=4)  # ('data','model') = (2,4)
    p_repl = jax.device_put(params, replicated(mesh))
    bx, bz = shard_batch((x, z), mesh)
    with spatial_sharding(mesh, min_res=64):
        got = np.asarray(jax.jit(fwd)(p_repl, bx, bz))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
