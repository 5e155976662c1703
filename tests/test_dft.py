"""Matmul-DFT equivalence vs jnp.fft (spectral/dft.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from shgan_tpu.spectral.dft import rfft2_matmul, irfft2_matmul


@pytest.mark.parametrize("shape", [(2, 3, 64, 64), (1, 2, 16, 16),
                                   (2, 1, 4, 4)])
def test_rfft2_matmul_matches_fft(shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    re, im = rfft2_matmul(x)
    ref = jnp.fft.rfft2(x, norm="forward")
    np.testing.assert_allclose(np.asarray(re), np.asarray(ref.real),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(im), np.asarray(ref.imag),
                               atol=1e-6)


@pytest.mark.parametrize("res", [4, 8, 32, 64])
def test_irfft2_matmul_matches_fft(res):
    rng = np.random.RandomState(1)
    sp = (rng.randn(2, 3, res, res // 2 + 1)
          + 1j * rng.randn(2, 3, res, res // 2 + 1)).astype(np.complex64)
    out = irfft2_matmul(jnp.asarray(sp.real), jnp.asarray(sp.imag),
                        s=(res, res))
    ref = jnp.fft.irfft2(jnp.asarray(sp), s=(res, res), norm="forward")
    # outputs are O(res)-magnitude sums of O(1) terms; float32-relative
    scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6 * max(scale, 1.0))


def test_roundtrip():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 2, 32, 32).astype(np.float32))
    re, im = rfft2_matmul(x)
    y = irfft2_matmul(re, im, s=(32, 32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
