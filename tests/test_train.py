"""Training-step tests: losses finite, params move, EMA/buffer semantics,
lazy-reg phases, and the full SPMD step over an 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from shgan_tpu.models import get_model
from shgan_tpu.train import (TrainConfig, init_train_state, make_train_step,
                             compute_ema_beta, ema_update)
from shgan_tpu.parallel import create_mesh, shard_batch, replicated

ACT = "lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)"


def tiny_models(res=64):
    enc_args = dict(resolution=res, ic_n=4, oc_n=32, ch_base=256, ch_max=8,
                    use_fp16_before_res=None, resample_filter=[1, 3, 3, 1],
                    activation=ACT, mbstd_group_size=0, mbstd_c_n=0,
                    c_dim=None, cmap_dim=None, use_dropout=True,
                    has_extra_final_layer=False, shu_input_res=16,
                    shu_lowest_res=4, shu_channels=4,
                    shu_df_freedom=[2, 3], shu_df_type="piecewise_linear",
                    shu_tail_sigma_mult=3, shu_gaussian_at_input_res=False)
    g_cfg = {"type": "comodgan_generator", "args": {
        "mapping": {"type": "comodgan_mapping",
                    "args": dict(z_dim=32, c_dim=0, w_dim=32, num_ws=10,
                                 num_layers=2, activation=ACT,
                                 lr_multiplier=0.01)},
        "encoder": {"type": "shgan_encoder", "args": enc_args},
        "synthesis": {"type": "comodgan_synthesis",
                      "args": dict(w_dim=32, w0_dim=32, resolution=res,
                                   rgb_n=3, ch_base=256, ch_max=8,
                                   use_fp16_after_res=None,
                                   resample_filter=[1, 3, 3, 1],
                                   activation=ACT)}}}
    d_cfg = {"type": "comodgan_discriminator",
             "args": dict(resolution=res, ic_n=4, ch_base=256, ch_max=8,
                          use_fp16_before_res=None, activation=ACT,
                          mbstd_group_size=4, mbstd_c_n=1)}
    return get_model(g_cfg), get_model(d_cfg)


def make_batch(n, res, seed=0):
    rng = np.random.RandomState(seed)
    real = rng.randn(n, 3, res, res).astype(np.float32)
    mask = (rng.rand(n, 1, res, res) > 0.4).astype(np.float32)
    return jnp.asarray(real), jnp.asarray(mask)


@pytest.fixture(scope="module")
def setup():
    G, D = tiny_models()
    cfg = TrainConfig()
    state = init_train_state(G, D, jax.random.key(0), cfg)
    return G, D, cfg, state


@pytest.mark.slow
def test_full_step_with_both_regs(setup):
    G, D, cfg, state = setup
    batch = make_batch(4, 64)
    step = jax.jit(make_train_step(G, D, cfg),
                   static_argnames=("do_greg", "do_dreg"))
    new_state, metrics = step(state, batch, jax.random.key(1),
                              jnp.float32(0.99), do_greg=True, do_dreg=True)
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # params must move
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state["params_g"], new_state["params_g"])
    assert max(jax.tree.leaves(moved)) > 0
    # pl_mean updated from 0
    assert float(new_state["pl_mean"]) > 0
    assert int(new_state["step"]) == 1


@pytest.mark.slow
def test_main_only_step(setup):
    G, D, cfg, state = setup
    batch = make_batch(4, 64)
    step = jax.jit(make_train_step(G, D, cfg),
                   static_argnames=("do_greg", "do_dreg"))
    new_state, metrics = step(state, batch, jax.random.key(2),
                              jnp.float32(0.99), do_greg=False,
                              do_dreg=False)
    assert float(new_state["pl_mean"]) == float(state["pl_mean"])
    assert np.isfinite(float(metrics["loss_g"]))
    assert np.isfinite(float(metrics["loss_d"]))


def test_ema_semantics(setup):
    G, D, cfg, state = setup
    # params lerp toward new values; buffers copied exactly
    p = state["params_g"]
    p2 = jax.tree.map(lambda x: x + 1.0, p)
    ema = ema_update(p, p2, jnp.float32(0.5))
    # a weight leaf: lerped halfway
    w_old = p["synthesis"]["b4"]["conv"]["weight"]
    w_new = ema["synthesis"]["b4"]["conv"]["weight"]
    np.testing.assert_allclose(np.asarray(w_new - w_old), 0.5, atol=1e-6)
    # a buffer leaf: copied
    nc_new = ema["synthesis"]["b4"]["conv"]["noise_const"]
    nc_p2 = p2["synthesis"]["b4"]["conv"]["noise_const"]
    np.testing.assert_array_equal(np.asarray(nc_new), np.asarray(nc_p2))


def test_ema_beta_schedule():
    cfg = TrainConfig(ema_kimg=10, ema_rampup=0.05)
    assert compute_ema_beta(cfg, 32, 0) == pytest.approx(0.5 ** (32 / 1e-8))
    b = compute_ema_beta(cfg, 32, 10_000_000)
    assert b == pytest.approx(0.5 ** (32 / 10_000))


@pytest.mark.slow
def test_spmd_step_on_mesh(setup):
    """Full train step jitted over an 8-device mesh with the batch sharded
    on the data axis — the DDP replacement."""
    G, D, cfg, state = setup
    assert len(jax.devices()) == 8
    mesh = create_mesh(8)
    batch = make_batch(8, 64)
    batch = shard_batch(batch, mesh)
    rep = replicated(mesh)
    state_sharded = jax.device_put(state, rep)

    step = jax.jit(make_train_step(G, D, cfg),
                   static_argnames=("do_greg", "do_dreg"))
    new_state, metrics = step(state_sharded, batch, jax.random.key(3),
                              jnp.float32(0.99), do_greg=True, do_dreg=True)
    assert np.isfinite(float(metrics["loss_g"]))
    assert np.isfinite(float(metrics["loss_d"]))
    # the updated params stay replicated (single value across devices)
    w = new_state["params_g"]["synthesis"]["b4"]["conv"]["weight"]
    assert w.sharding.is_fully_replicated


@pytest.mark.slow
def test_spmd_matches_single_device(setup):
    """The sharded step must produce the same update as the unsharded one
    (determinism of the SPMD lowering)."""
    G, D, cfg, state = setup
    step = jax.jit(make_train_step(G, D, cfg),
                   static_argnames=("do_greg", "do_dreg"))
    batch = make_batch(8, 64)
    s1, m1 = step(state, batch, jax.random.key(4), jnp.float32(0.99),
                  do_greg=False, do_dreg=False)

    mesh = create_mesh(8)
    sb = shard_batch(batch, mesh)
    ss = jax.device_put(state, replicated(mesh))
    s2, m2 = step(ss, sb, jax.random.key(4), jnp.float32(0.99),
                  do_greg=False, do_dreg=False)
    np.testing.assert_allclose(float(m1["loss_g"]), float(m2["loss_g"]),
                               rtol=1e-4)
    w1 = np.asarray(s1["params_g"]["synthesis"]["b4"]["conv"]["weight"])
    w2 = np.asarray(s2["params_g"]["synthesis"]["b4"]["conv"]["weight"])
    np.testing.assert_allclose(w1, w2, rtol=1e-3, atol=1e-5)
