"""Tests for the Pallas separable-FIR kernel (`ops/fir_pallas.py`).

Runs the kernel through the Pallas *interpreter* on CPU (same kernel body
the TPU executes) and checks it against the XLA depthwise-conv path that
`ops/upfirdn2d.py` uses everywhere else, plus the custom VJP against
JAX autodiff of the XLA path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from shgan_tpu.ops import upfirdn2d, setup_filter
from shgan_tpu.ops import fir_pallas


@pytest.fixture
def interpret_impl():
    prev = fir_pallas.get_fir_impl()
    fir_pallas.set_fir_impl("interpret")
    yield
    fir_pallas.set_fir_impl(prev)


def test_separable_factor_roundtrip():
    rng = np.random.RandomState(0)
    a = rng.randn(4)
    b = rng.randn(3)
    fac = fir_pallas.separable_factor(np.outer(a, b))
    assert fac is not None
    fcol, frow = fac
    np.testing.assert_allclose(np.outer(fcol, frow), np.outer(a, b),
                               atol=1e-12)
    # canonical sign: largest |tap| of frow positive
    assert frow[int(np.argmax(np.abs(frow)))] > 0


def test_separable_factor_rejects_full_rank():
    rng = np.random.RandomState(1)
    assert fir_pallas.separable_factor(rng.randn(4, 4)) is None


@pytest.mark.parametrize("shape,taps", [
    ((2, 3, 19, 23), (4, 4)),
    ((1, 5, 12, 33), (3, 5)),   # asymmetric taps
    ((2, 4, 9, 9), (1, 2)),
])
def test_interpret_matches_xla(interpret_impl, shape, taps):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    fcol = tuple(float(v) for v in rng.randn(taps[0]))
    frow = tuple(float(v) for v in rng.randn(taps[1]))
    got = fir_pallas.fir_separable_valid(x, fcol, frow)
    want = fir_pallas._xla_fir(x, fcol, frow)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_custom_vjp_matches_autodiff(interpret_impl):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 2, 11, 13).astype(np.float32))
    cot = jnp.asarray(rng.randn(2, 2, 8, 10).astype(np.float32))
    fcol = tuple(float(v) for v in rng.randn(4))
    frow = tuple(float(v) for v in rng.randn(4))

    g_kernel = jax.grad(
        lambda x: jnp.sum(fir_pallas.fir_separable_valid(x, fcol, frow) * cot)
    )(x)
    g_xla = jax.grad(
        lambda x: jnp.sum(fir_pallas._xla_fir(x, fcol, frow) * cot)
    )(x)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_xla),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("f,up,padding", [
    (setup_filter([1, 3, 3, 1]), 2, 2),          # SG2 resample filter, 1D
    (setup_filter([1, 3, 3, 1], separable=False), 2, 2),  # same, 2D outer
    (setup_filter([1, 2, 1]), 1, 1),
])
def test_upfirdn2d_routes_through_kernel(interpret_impl, f, up, padding):
    """upfirdn2d output is impl-invariant for the stride-1 cases the kernel
    claims (up>=1, down=1, separable filter) — including gain/flip folding."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 3, 8, 8).astype(np.float32))
    got = upfirdn2d(x, f, up=up, padding=padding, gain=up ** 2)
    fir_pallas.set_fir_impl("xla")
    want = upfirdn2d(x, f, up=up, padding=padding, gain=up ** 2)
    fir_pallas.set_fir_impl("interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_nonseparable_filter_stays_on_xla_path(interpret_impl):
    """A full-rank 2D filter must not be routed (separable_factor → None);
    result still matches the reference contract via the XLA path."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 2, 8, 8).astype(np.float32))
    f = rng.randn(3, 3).astype(np.float32)
    got = upfirdn2d(x, f, padding=1)
    fir_pallas.set_fir_impl("xla")
    want = upfirdn2d(x, f, padding=1)
    fir_pallas.set_fir_impl("interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
