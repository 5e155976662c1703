"""Known-bad compile-shape guard (runtime/limits.py): fail fast with the
supported-batch table instead of a 20-minute opaque remote-compile 500."""

import pytest

from shgan_tpu.runtime.limits import validate_per_chip_batch, MAX_BATCH


def test_validate_noop_on_cpu():
    # backend here is CPU (conftest pins it) — the v5e table must not fire
    validate_per_chip_batch(256, 128, "test")


def test_validate_fires_on_tpu(monkeypatch):
    import jax
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    validate_per_chip_batch(256, 104, "test")  # boundary itself is fine
    validate_per_chip_batch(512, 120, "test")
    validate_per_chip_batch(1024, 48, "test")
    validate_per_chip_batch(2048, 999, "test")  # no entry → no opinion
    with pytest.raises(ValueError, match="104"):
        validate_per_chip_batch(256, 120, "test")
    with pytest.raises(ValueError, match="ResourceExhausted"):
        validate_per_chip_batch(512, 128, "test")
    with pytest.raises(ValueError, match="UNFOLDED"):
        validate_per_chip_batch(1024, 56, "test")
    monkeypatch.setenv("SHGAN_SKIP_BATCH_LIMITS", "1")
    validate_per_chip_batch(256, 128, "test")  # explicit override


def test_stage_guard_full_size_only(monkeypatch):
    """The guard keys on the full-size channel plan — small/test models
    at any batch never trip it."""
    import jax
    from shgan_tpu.runtime.stages import _check_batch_limits
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    small = {"args": {"synthesis": {"args": {"resolution": 256,
                                             "ch_base": 256}}}}
    _check_batch_limits(small, 512, 1, "test")  # fine
    full = {"args": {"synthesis": {"args": {"resolution": 256,
                                            "ch_base": 32768}}}}
    with pytest.raises(ValueError):
        _check_batch_limits(full, 120, 1, "test")
    _check_batch_limits(full, 768, 8, "test")  # 96/chip on 8 chips: fine
