"""Noise-injection RNG dispatch (ops/noise.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shgan_tpu.ops import noise as noise_mod


def test_jax_fallback_shape_and_stats():
    x = noise_mod.random_noise(jax.random.key(0), 8, 64)
    assert x.shape == (8, 1, 64, 64)
    assert x.dtype == jnp.float32
    a = np.asarray(x)
    assert abs(a.mean()) < 0.05 and abs(a.std() - 1) < 0.05


def test_impl_flag_dispatch(monkeypatch):
    noise_mod.set_noise_impl("jax")
    try:
        assert not noise_mod._use_pallas()
        noise_mod.set_noise_impl("pallas")
        assert noise_mod._use_pallas()
        # on CPU the pallas branch is skipped regardless of the flag
        x = noise_mod.random_noise(jax.random.key(1), 2, 16)
        assert x.shape == (2, 1, 16, 16)
    finally:
        noise_mod.set_noise_impl(None)
    monkeypatch.setenv("SHGAN_PALLAS_NOISE", "1")
    assert noise_mod._use_pallas()
    monkeypatch.delenv("SHGAN_PALLAS_NOISE")
    assert not noise_mod._use_pallas()


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas TPU kernel needs a TPU")
def test_pallas_normal_stats():
    x = np.asarray(jax.jit(
        lambda k: noise_mod._pallas_normal(k, 8, 128))(jax.random.key(3)))
    assert x.shape == (8, 128, 128)
    assert abs(x.mean()) < 0.02 and abs(x.std() - 1) < 0.02
    kurt = ((x - x.mean()) ** 4).mean() / x.std() ** 4
    assert abs(kurt - 3.0) < 0.1
