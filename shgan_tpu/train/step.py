"""The SPMD training step: two-optimizer alternating GAN phases with lazy
regularization, G-EMA, and NaN scrubbing — jit-compiled over a device mesh.

This replaces the reference's per-GPU phase machinery
(`/root/reference/lib/experiments/stylegan_default.py:138-166,304-320,383-390`)
with a single compiled step per phase combination:

  * every step:       Gmain + Dmain
  * every g_reg_int.: + Greg (path length),   gain = g_reg_interval
  * every d_reg_int.: + Dreg (R1),            gain = d_reg_interval

Lazy-regularization optimizer scaling (lr·mb_ratio, betas**mb_ratio,
reference `:304-320`) is folded into the Adam hyperparameters at
construction.  NaN scrubbing of gradients (reference `:161-164`) is an optax
transform.  The G-EMA lerp (reference `:383-390`) lerps parameters and
copies buffers (noise_const / w_avg), with the ema-beta passed in as a
traced scalar so ramp-up does not retrace.

Under ``jax.jit`` with the batch sharded on the mesh's ``data`` axis and
state replicated, the ``.mean()`` reductions in the losses make XLA insert
the gradient all-reduce over ICI — the SPMD equivalent of DDP.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import optax

from . import loss as L

# leaves treated as buffers: EMA copies them, optimizer ignores them
_BUFFER_NAMES = ("noise_const", "w_avg")


def _is_buffer(path):
    return any(getattr(p, "key", None) in _BUFFER_NAMES for p in path)


def nan_scrub():
    """optax transform replicating the reference's pre-step NaN scrub
    (nan→0, ±inf→±1e5, stylegan_default.py:161-164)."""

    def update(updates, state, params=None):
        updates = jax.tree.map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5),
            updates)
        return updates, state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update)


def make_optimizer(lr=0.002, betas=(0.0, 0.99), eps=1e-8, reg_interval=None):
    """Adam with lazy-regularization hyperparameter scaling
    (reference stylegan_default.py:304-320)."""
    if reg_interval is not None:
        mb_ratio = reg_interval / (reg_interval + 1)
        lr = lr * mb_ratio
        betas = tuple(b ** mb_ratio for b in betas)
    return optax.chain(
        nan_scrub(),
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        optax.scale(-lr),
    )


@dataclass
class TrainConfig:
    style_mixing_prob: float = 0.9
    r1_gamma: float = 10.0
    pl_weight: float = 2.0
    pl_decay: float = 0.01
    pl_batch_shrink: int = 2
    g_reg_interval: int = 4
    d_reg_interval: int = 16
    g_opt: dict = field(default_factory=lambda: dict(lr=0.002,
                                                     betas=(0.0, 0.99)))
    d_opt: dict = field(default_factory=lambda: dict(lr=0.002,
                                                     betas=(0.0, 0.99)))
    ema_kimg: float = 10.0
    ema_rampup: float | None = None


def init_train_state(G, D, key, cfg: TrainConfig):
    """Build the full training state pytree."""
    kg, kd = jax.random.split(key)
    params_g = G.init(kg)
    params_d = D.init(kd)
    g_tx = make_optimizer(**cfg.g_opt, reg_interval=cfg.g_reg_interval)
    d_tx = make_optimizer(**cfg.d_opt, reg_interval=cfg.d_reg_interval)
    return {
        "params_g": params_g,
        "params_d": params_d,
        # real copies, not aliases: params_gema leaves must be distinct
        # buffers from params_g or donating the state fails with
        # "attempt to donate the same buffer twice"
        "params_gema": jax.tree.map(jnp.copy, params_g),
        "opt_g": g_tx.init(params_g),
        "opt_d": d_tx.init(params_d),
        "pl_mean": jnp.zeros((), jnp.float32),
        "step": jnp.zeros((), jnp.int32),
    }


def ema_update(params_ema, params, ema_beta):
    """p_ema = p.lerp(p_ema, beta); buffers copied (reference `:383-390`)."""

    def upd(path, pe, p):
        if _is_buffer(path):
            return p
        return p + ema_beta * (pe - p)

    return jax.tree_util.tree_map_with_path(upd, params_ema, params)


def make_train_step(G, D, cfg: TrainConfig):
    """Returns ``train_step(state, batch, rng, ema_beta, do_greg, do_dreg)``
    — jit it (optionally with shardings) at the call site.  ``do_greg`` /
    ``do_dreg`` are static.  batch = (real [N,3,H,W], mask [N,1,H,W])."""
    g_tx = make_optimizer(**cfg.g_opt, reg_interval=cfg.g_reg_interval)
    d_tx = make_optimizer(**cfg.d_opt, reg_interval=cfg.d_reg_interval)

    def train_step(state, batch, rng, ema_beta, do_greg, do_dreg):
        real, mask = batch
        real = real.astype(jnp.float32)
        mask = mask.astype(jnp.float32)
        x_in = jnp.concatenate([mask - 0.5, real * mask], axis=1)
        n = real.shape[0]
        c = jnp.zeros((n, 0), jnp.float32)
        k_g, k_gpl, k_d, k_z1, k_z2, k_z3 = jax.random.split(rng, 6)
        metrics = {}

        # ----- G phase (Gmain [+ Greg]) -----
        def g_loss_fn(params_g):
            z = jax.random.normal(k_z1, (n, G.z_dim))
            loss_main, aux = L.g_main_loss(
                G, D, params_g, state["params_d"], x_in, mask, z, c, k_g,
                style_mixing_prob=cfg.style_mixing_prob)
            total = loss_main
            new_pl_mean = state["pl_mean"]
            pl_len = jnp.zeros(())
            if do_greg:
                z2 = jax.random.normal(k_z2, (n, G.z_dim))
                loss_pl, new_pl_mean, pl_len = L.g_pl_loss(
                    G, params_g, x_in, z2, c, k_gpl, state["pl_mean"],
                    pl_decay=cfg.pl_decay, pl_weight=cfg.pl_weight,
                    pl_batch_shrink=cfg.pl_batch_shrink)
                # lazy reg: loss scaled by the interval (gain,
                # stylegan_default.py:156)
                total = total + loss_pl * cfg.g_reg_interval
            return total, (aux, new_pl_mean, pl_len, loss_main)

        (g_total, (g_aux, new_pl_mean, pl_len, g_main)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(state["params_g"]))
        g_updates, new_opt_g = g_tx.update(g_grads, state["opt_g"],
                                           state["params_g"])
        params_g = optax.apply_updates(state["params_g"], g_updates)
        # w_avg EMA from the Gmain mapping pass (stylegan.py:416-417)
        if g_aux["w_avg"] is not None:
            params_g["mapping"]["w_avg"] = g_aux["w_avg"]
        metrics["loss_g"] = g_main
        metrics["pl_mean"] = new_pl_mean
        metrics["pl_lengths"] = pl_len
        metrics["scores_fake_g"] = g_aux["scores_fake"]

        # ----- D phase (Dmain [+ Dreg]) -----
        def d_loss_fn(params_d):
            z = jax.random.normal(k_z3, (n, G.z_dim))
            loss_main, aux = L.d_main_loss(
                G, D, params_g, params_d, x_in, mask, real, z, c, k_d)
            total = loss_main
            r1 = jnp.zeros(())
            if do_dreg:
                loss_r1, r1 = L.d_r1_loss(D, params_d, mask, real, c,
                                          r1_gamma=cfg.r1_gamma)
                total = total + loss_r1 * cfg.d_reg_interval
            return total, (aux, r1, loss_main)

        (d_total, (d_aux, r1_pen, d_main)), d_grads = (
            jax.value_and_grad(d_loss_fn, has_aux=True)(state["params_d"]))
        d_updates, new_opt_d = d_tx.update(d_grads, state["opt_d"],
                                           state["params_d"])
        params_d = optax.apply_updates(state["params_d"], d_updates)
        metrics["loss_d"] = d_main
        metrics["r1_penalty"] = r1_pen
        metrics["scores_real"] = d_aux["scores_real"]
        metrics["scores_fake_d"] = d_aux["scores_fake"]

        params_gema = ema_update(state["params_gema"], params_g, ema_beta)

        new_state = {
            "params_g": params_g,
            "params_d": params_d,
            "params_gema": params_gema,
            "opt_g": new_opt_g,
            "opt_d": new_opt_d,
            "pl_mean": new_pl_mean,
            "step": state["step"] + 1,
        }
        return new_state, metrics

    return train_step


def compute_ema_beta(cfg: TrainConfig, batch_size, cur_nimg):
    """Host-side EMA beta with optional ramp-up (reference `:383-387`)."""
    ema_nimg = cfg.ema_kimg * 1000
    if cfg.ema_rampup is not None:
        ema_nimg = min(ema_nimg, cur_nimg * cfg.ema_rampup)
    return 0.5 ** (batch_size / max(ema_nimg, 1e-8))
