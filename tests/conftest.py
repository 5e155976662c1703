"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware, and expose the reference implementation (mounted
read-only at /root/reference) as a numerical oracle."""

import os

# Must run before jax initializes a backend.  (JAX_PLATFORMS alone is not
# honored when the axon TPU plugin is installed; JAX_PLATFORM_NAME +
# jax.config both are.)
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
if "collective_call_terminate_timeout" not in _flags:
    # 8-participant CPU collectives on a 1-core box can exceed the default
    # 40 s rendezvous termination under load (XLA aborts the process);
    # they do complete — give them time.
    _flags += " --xla_cpu_collective_call_terminate_timeout_seconds=600"
os.environ["XLA_FLAGS"] = _flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache for the CPU test backend: the quick tier is
# dominated by XLA CPU compiles (1-core box), and the cache is keyed by HLO
# hash so it can never mask a code change — warm runs skip every compile
# that survived unchanged.  SHGAN_TEST_NO_COMPILE_CACHE=1 disables (cold
# timing measurements).
if os.environ.get("SHGAN_TEST_NO_COMPILE_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SHGAN_TEST_COMPILE_CACHE",
                                     "/root/.jax_cpu_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: `pytest -m quick` (< ~2.5 min) vs full (~25 min on
    this 1-CPU box).  Every test not explicitly @pytest.mark.slow gets the
    quick marker."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def ref():
    """Import the reference PyTorch implementation as a parity oracle.

    The reference imports torchvision (unavailable); stub it — only the
    model zoo is exercised, which never actually uses torchvision.
    """
    import sys
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import lib.model_zoo.stylegan as ref_stylegan  # noqa: F401
    import lib.model_zoo.comodgan as ref_comodgan  # noqa: F401
    import lib.model_zoo.shgan as ref_shgan  # noqa: F401
    from lib.model_zoo.stylegan_utils import upfirdn2d as ref_upfirdn2d
    from lib.model_zoo.stylegan_utils import conv2d_resample as ref_conv2d_resample

    ns = types.SimpleNamespace(
        stylegan=ref_stylegan,
        comodgan=ref_comodgan,
        shgan=ref_shgan,
        upfirdn2d=ref_upfirdn2d,
        conv2d_resample=ref_conv2d_resample,
    )
    return ns
