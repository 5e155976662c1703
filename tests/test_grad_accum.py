"""Gradient-accumulation rounds (TrainConfig.grad_accum — reference
stylegan_default.py:149-156): A micro-batches must average to ~the same
update as one full batch when the loss decomposes per-sample."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

import sys
import os.path as osp
sys.path.insert(0, osp.dirname(__file__))
from test_train_stage import _tiny_cfg  # noqa: E402

from shgan_tpu.models import get_model
from shgan_tpu.train import TrainConfig, init_train_state, make_train_step


@pytest.fixture(scope="module")
def models():
    cfg = _tiny_cfg("/tmp/unused")
    return get_model(cfg["model_g"]), get_model(cfg["model_d"])


def _run(G, D, accum, batch, key):
    cfg = TrainConfig(grad_accum=accum, style_mixing_prob=0.0)
    state = init_train_state(G, D, jax.random.key(0), cfg)
    step = jax.jit(make_train_step(G, D, cfg),
                   static_argnames=("do_greg", "do_dreg"))
    state, metrics = step(state, batch, key, jnp.float32(0.99),
                          do_greg=True, do_dreg=True)
    return state, metrics


def test_grad_accum_runs_and_is_finite(models):
    G, D = models
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    mask = jnp.asarray((rng.rand(8, 1, 32, 32) > 0.5).astype(np.float32))
    key = jax.random.key(7)

    s1, m1 = _run(G, D, 1, (real, mask), key)
    s4, m4 = _run(G, D, 4, (real, mask), key)
    for m in (m1, m4):
        for k, v in m.items():
            assert np.isfinite(np.asarray(v)).all(), k
    assert int(s4["step"]) == 1
    # different RNG partitioning → not identical, but same magnitude
    g1 = float(m1["loss_g"])
    g4 = float(m4["loss_g"])
    assert abs(g1 - g4) < 5.0, (g1, g4)
    # parameters moved in both cases
    w1 = np.asarray(jax.tree.leaves(s1["params_g"])[0])
    w4 = np.asarray(jax.tree.leaves(s4["params_g"])[0])
    w0 = np.asarray(jax.tree.leaves(
        init_train_state(G, D, jax.random.key(0),
                         TrainConfig())["params_g"])[0])
    assert not np.allclose(w1, w0) and not np.allclose(w4, w0)


def test_grad_accum_chains_w_avg(models):
    """A accumulation rounds apply A CHAINED w_avg lerps (the reference's
    in-place buffer), not just the last round's update from the stale
    pre-step value (train/step.py g_round).  With beta=0.995 and w0=0,
    one lerp leaves |w_avg| ≈ 0.005|m|; A=4 chained ≈ 4× that."""
    G, D = models
    rng = np.random.RandomState(1)
    real = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    mask = jnp.asarray((rng.rand(8, 1, 32, 32) > 0.5).astype(np.float32))
    key = jax.random.key(3)

    beta = G.mapping.w_avg_beta
    s1, _ = _run(G, D, 1, (real, mask), key)
    s4, _ = _run(G, D, 4, (real, mask), key)
    w0 = np.asarray(init_train_state(
        G, D, jax.random.key(0), TrainConfig())
        ["params_g"]["mapping"]["w_avg"])
    d1 = np.abs(np.asarray(s1["params_g"]["mapping"]["w_avg"]) - w0).mean()
    d4 = np.abs(np.asarray(s4["params_g"]["mapping"]["w_avg"]) - w0).mean()
    assert d1 > 0 and d4 > 0
    # chained lerps move ~A× further than a single one (micro-batch means
    # differ, so allow a wide band; the broken last-round-only behavior
    # gives d4 ≈ d1)
    ratio = d4 / d1
    lo = (1 - beta ** 4) / (1 - beta) * 0.5   # ≈ 2.0
    assert ratio > lo, (ratio, d1, d4)
