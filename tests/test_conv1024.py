"""Opt-in Pallas low-channel conv (ops/conv1024.py) vs the XLA conv it
can replace — interpret mode on the CPU-pinned test backend (the TPU
numbers live in docs/perf_ab.json's "1024² conv formulations" record)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas import tpu as pltpu

import shgan_tpu.ops.conv1024 as c24


@pytest.mark.parametrize("n,c,h,w", [(2, 8, 16, 256), (1, 32, 24, 128)])
def test_conv3x3_lowch_matches_xla(n, c, h, w, monkeypatch):
    monkeypatch.setattr(c24, "BH", 8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, c, h, w).astype(np.float32))
    wt = jnp.asarray(rng.randn(c, c, 3, 3).astype(np.float32) * 0.1)
    want = lax.conv_general_dilated(
        x, wt, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(
            lambda a, b: c24.conv3x3_lowch.__wrapped__(a, b))(x, wt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_conv1024_dispatch_routes_and_matches(monkeypatch):
    """set_conv1024_impl('pallas') routes eligible stride-1 3×3 convs in
    conv_resample onto the kernel (threshold shrunk for CPU interpret
    mode) and stays bit-off-by-float only; ineligible shapes and the
    default 'xla' impl keep the XLA conv."""
    import shgan_tpu.ops.conv_resample as cr

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 16, 16).astype(np.float32))
    wt = jnp.asarray(rng.randn(8, 8, 3, 3).astype(np.float32) * 0.1)
    want = cr.conv2d_resample(x, wt, padding=1)

    monkeypatch.setattr(c24, "MIN_RES", 16)
    monkeypatch.setattr(c24, "_IMPL", "pallas")
    assert c24.conv1024_eligible(x.shape, wt.shape, 1, 1, (1, 1))
    # stride/kernel/channel misfits fall through to XLA
    assert not c24.conv1024_eligible(x.shape, wt.shape, 2, 1, (1, 1))
    assert not c24.conv1024_eligible((1, 64, 16, 16), (64, 64, 3, 3),
                                     1, 1, (1, 1))
    with pltpu.force_tpu_interpret_mode():
        got = cr.conv2d_resample(x, wt, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    # env override pins the impl off regardless of the runtime switch
    monkeypatch.setenv("SHGAN_CONV1024", "xla")
    c24.set_conv1024_impl("pallas")
    assert not c24.conv1024_eligible(x.shape, wt.shape, 1, 1, (1, 1))
    monkeypatch.delenv("SHGAN_CONV1024")
    c24.set_conv1024_impl("xla")
