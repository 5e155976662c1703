"""LR-schedule / optimizer registry parity vs the reference
(`lib/model_zoo/common/get_scheduler.py`, `get_optimizer.py`)."""

import numpy as np
import pytest

from shgan_tpu.train.schedules import get_scheduler, get_optimizer


PIPELINE = [
    {"type": "linear", "args": {"start_lr": 1e-3, "end_lr": 1e-4,
                                "step": 50}},
    {"type": "poly", "args": {"start_lr": 1e-4, "end_lr": 1e-5,
                              "power": 2.0, "step": 30}},
    {"type": "multistage", "args": {"start_lr": 1e-5, "milestones": [5, 15],
                                    "gamma": 0.1, "step": 25}},
    {"type": "constant", "args": {"lr": 3e-7, "step": 10}},
]


def _reference_schedule(ref):
    from lib.model_zoo.common import get_scheduler as ref_sched

    class _Cfg:
        def __init__(self, d):
            self.type = d["type"]
            self.args = d["args"]

    return ref_sched.get_scheduler()([_Cfg(d) for d in PIPELINE])


def test_composed_schedule_matches_reference(ref):
    ours = get_scheduler(PIPELINE)
    theirs = _reference_schedule(ref)
    assert ours.step == theirs.step
    np.testing.assert_allclose(ours.to_list(), theirs.to_list(), rtol=1e-6)


def test_schedule_is_jit_traceable():
    import jax
    import jax.numpy as jnp

    sched = get_scheduler(PIPELINE)
    f = jax.jit(lambda s: sched(s))
    eager = [sched[i] for i in range(sched.step)]
    jitted = [float(f(jnp.int32(i))) for i in range(sched.step)]
    np.testing.assert_allclose(jitted, eager, rtol=1e-5)
    # past-the-end clamps instead of raising (total under jit)
    assert float(f(jnp.int32(sched.step + 100))) == pytest.approx(eager[-1])
    with pytest.raises(ValueError):
        sched[sched.step]


def test_optimizer_registry_builds_and_steps():
    import jax.numpy as jnp
    import optax

    sched = get_scheduler(PIPELINE)
    for cfg in [{"type": "adam", "args": {"betas": (0.0, 0.99)}},
                {"type": "sgd", "args": {"momentum": 0.9}}]:
        tx = get_optimizer(cfg, sched)
        params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
        state = tx.init(params)
        grads = {"w": jnp.full((3,), 0.5), "b": jnp.full((2,), -1.0)}
        updates, state = tx.update(grads, state, params)
        params2 = optax.apply_updates(params, updates)
        assert np.isfinite(np.asarray(params2["w"])).all()
        assert not np.allclose(np.asarray(params2["w"]),
                               np.asarray(params["w"]))
