"""utils/: shape asserts, profiling scope, timing fence."""

import jax.numpy as jnp
import pytest

from shgan_tpu.utils import (assert_shape, profiled_function, constant_cache,
                             device_timeit)


def test_assert_shape():
    x = jnp.zeros((2, 3, 4))
    assert_shape(x, (2, 3, 4))
    assert_shape(x, (None, 3, None))
    with pytest.raises(AssertionError):
        assert_shape(x, (2, 3))
    with pytest.raises(AssertionError):
        assert_shape(x, (2, 3, 5))


def test_profiled_function_passthrough():
    @profiled_function
    def f(a, b):
        return a + b
    assert float(f(jnp.float32(1), jnp.float32(2))) == 3.0
    assert f.__name__ == "f"


def test_constant_cache():
    calls = []

    @constant_cache
    def build(n):
        calls.append(n)
        return n * 2

    assert build(3) == 6 and build(3) == 6
    assert calls == [3]


def test_device_timeit_runs():
    import jax
    f = jax.jit(lambda x: x * 2)
    t = device_timeit(f, jnp.ones((8, 8)), iters=2, warmup=1)
    assert t > 0
