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
from jax import lax
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


def freeze_buffers():
    """optax transform zeroing updates for buffer leaves (noise_const,
    w_avg): their grads are zero, but param-coupled transforms like
    optax.add_decayed_weights emit updates proportional to the PARAM for
    every leaf — without this, a custom optimizer with weight_decay would
    shrink the noise buffers toward zero each step."""

    def update(updates, state, params=None):
        updates = jax.tree_util.tree_map_with_path(
            lambda path, u: jnp.zeros_like(u) if _is_buffer(path) else u,
            updates)
        return updates, state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update)


def make_optimizer(lr=0.002, betas=(0.0, 0.99), eps=1e-8, reg_interval=None,
                   optimizer=None, schedule=None):
    """Adam with lazy-regularization hyperparameter scaling
    (reference stylegan_default.py:304-320).

    ``schedule`` (a list of {"type", "args"} segments) and ``optimizer``
    ({"type", "args"}) come from the L1 registries in train/schedules.py —
    the reference's composable get_scheduler/get_optimizer plumbing
    (get_scheduler.py:13-141, get_optimizer.py:14-39) — and flow here from
    TrainConfig.g_opt / d_opt (config key train.loss_kwargs.g_opt.schedule
    etc.).  Lazy-reg scaling applies to the LR in all cases and to the
    betas of the default Adam; a custom optimizer's own args are used
    as-is."""
    mb_ratio = 1.0
    if reg_interval is not None:
        mb_ratio = reg_interval / (reg_interval + 1)
        betas = tuple(b ** mb_ratio for b in betas)
    if schedule is not None:
        from .schedules import get_scheduler
        base = get_scheduler(schedule)
        lr_fn = lambda count: base(count) * mb_ratio  # noqa: E731
    else:
        lr_fn = lr * mb_ratio
    if optimizer is not None:
        from .schedules import get_optimizer
        # freeze_buffers LAST: param-coupled transforms (weight_decay)
        # emit nonzero updates for zero-grad leaves, which would corrupt
        # noise_const/w_avg (default Adam only spares them by accident)
        return optax.chain(nan_scrub(), get_optimizer(optimizer, lr_fn),
                           freeze_buffers())
    return optax.chain(
        nan_scrub(),
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        optax.scale_by_learning_rate(lr_fn),
        freeze_buffers(),
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
    # micro-batch rounds per optimizer step (reference grad accumulation,
    # stylegan_default.py:149-156): the per-step batch is split into
    # grad_accum sequential micro-batches whose grads are averaged — same
    # effective batch at 1/grad_accum the activation memory
    grad_accum: int = 1
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

    A = max(int(cfg.grad_accum), 1)

    def train_step(state, batch, rng, ema_beta, do_greg, do_dreg):
        real, mask = batch
        real = real.astype(jnp.float32)
        mask = mask.astype(jnp.float32)
        x_in = jnp.concatenate([mask - 0.5, real * mask], axis=1)
        n = real.shape[0]
        assert n % A == 0, (n, A)
        nm = n // A  # micro-batch size
        k_g, k_gpl, k_d, k_z1, k_z2, k_z3 = jax.random.split(rng, 6)
        metrics = {}

        # w_avg chaining setup: the reference advances the 0.995-EMA
        # buffer on EVERY training-mode mapping forward — Gmain, Gpl, and
        # Dmain (run_G has no skip flag, stylegan.py:416-417).  Each
        # loss's aux update is a lerp from the w_avg its params carried;
        # sequential-buffer semantics compose via
        #   lerp(m_r, w) = aux_r + beta * (w - w_base)
        # when aux_r was computed from w_base (see g_round).
        has_wa = "w_avg" in state["params_g"]["mapping"]
        beta = getattr(G.mapping, "w_avg_beta", None)
        chain_wa = has_wa and beta is not None
        w0 = (state["params_g"]["mapping"]["w_avg"] if has_wa
              else jnp.zeros((0,)))

        # ----- G phase (Gmain [+ Greg]) -----
        def g_loss_fn(params_g, x_in, mask, keys, pl_mean):
            kz1, kz2, kg, kgpl = keys
            nb = x_in.shape[0]
            c = jnp.zeros((nb, 0), jnp.float32)
            z = jax.random.normal(kz1, (nb, G.z_dim))
            loss_main, aux = L.g_main_loss(
                G, D, params_g, state["params_d"], x_in, mask, z, c, kg,
                style_mixing_prob=cfg.style_mixing_prob)
            total = loss_main
            new_pl_mean = pl_mean
            pl_len = jnp.zeros(())
            pl_wa = jnp.zeros((0,))
            if do_greg:
                z2 = jax.random.normal(kz2, (nb, G.z_dim))
                loss_pl, new_pl_mean, pl_len, pl_w_avg = L.g_pl_loss(
                    G, params_g, x_in, z2, c, kgpl, pl_mean,
                    pl_decay=cfg.pl_decay, pl_weight=cfg.pl_weight,
                    pl_batch_shrink=cfg.pl_batch_shrink,
                    style_mixing_prob=cfg.style_mixing_prob)
                if pl_w_avg is not None:
                    pl_wa = pl_w_avg
                # lazy reg: loss scaled by the interval (gain,
                # stylegan_default.py:156)
                total = total + loss_pl * cfg.g_reg_interval
            return total, (aux, new_pl_mean, pl_len, loss_main, pl_wa)

        g_vgrad = jax.value_and_grad(g_loss_fn, has_aux=True)
        if A == 1:
            keys = (k_z1, k_z2, k_g, k_gpl)
            ((_, (g_aux, new_pl_mean, pl_len, g_main, pl_wa)),
             g_grads) = g_vgrad(
                state["params_g"], x_in, mask, keys, state["pl_mean"])
            if chain_wa and g_aux["w_avg"] is not None:
                wa = g_aux["w_avg"]          # Gmain lerp from w0
                if pl_wa.size:               # then the Gpl lerp
                    wa = pl_wa + beta * (wa - w0)
                g_aux = dict(g_aux, w_avg=wa)
        else:
            # sequential micro-batch rounds, grads averaged; pl_mean AND
            # w_avg chain through the rounds like the reference's in-place
            # buffers.  Every round's aux is a lerp from the same STALE
            # pre-step w0 (params are fixed across rounds); all Gmain
            # rounds fold first, then all Gpl rounds (the reference runs
            # the phases as separate full passes).
            def g_round(carry, inp):
                gacc, pl_mean, wa = carry
                x_mb, m_mb, keys = inp
                (_, (aux, pl_mean, pl_len, main, pl_wa)), grads = g_vgrad(
                    state["params_g"], x_mb, m_mb, keys, pl_mean)
                gacc = jax.tree.map(jnp.add, gacc, grads)
                if aux["w_avg"] is not None and chain_wa:
                    wa = aux["w_avg"] + beta * (wa - w0)
                return (gacc, pl_mean, wa), (aux["scores_fake"], pl_len,
                                             main, pl_wa)

            split = lambda t: t.reshape((A, nm) + t.shape[1:])
            keys = tuple(jax.random.split(k, A)
                         for k in (k_z1, k_z2, k_g, k_gpl))
            gacc0 = jax.tree.map(jnp.zeros_like, state["params_g"])
            (gacc, new_pl_mean, wa), (sf, pl_lens, mains, pl_was) = \
                lax.scan(g_round, (gacc0, state["pl_mean"], w0),
                         (split(x_in), split(mask), keys))
            g_grads = jax.tree.map(lambda t: t / A, gacc)
            if chain_wa and pl_was.shape[-1]:
                for r in range(A):  # Gpl rounds fold after all Gmain ones
                    wa = pl_was[r] + beta * (wa - w0)
            g_aux = {"scores_fake": sf.mean(),
                     "w_avg": wa if chain_wa else None}
            pl_len = pl_lens.mean()
            g_main = mains.mean()
        g_updates, new_opt_g = g_tx.update(g_grads, state["opt_g"],
                                           state["params_g"])
        params_g = optax.apply_updates(state["params_g"], g_updates)
        # chained w_avg EMA from the Gmain (+Gpl) mapping passes
        # (stylegan.py:416-417)
        if g_aux["w_avg"] is not None:
            params_g["mapping"]["w_avg"] = g_aux["w_avg"]
        metrics["loss_g"] = g_main
        metrics["pl_mean"] = new_pl_mean
        metrics["pl_lengths"] = pl_len
        metrics["scores_fake_g"] = g_aux["scores_fake"]

        # ----- D phase (Dmain [+ Dreg]) -----
        def d_loss_fn(params_d, x_in, mask, real, keys):
            kz3, kd = keys
            nb = x_in.shape[0]
            c = jnp.zeros((nb, 0), jnp.float32)
            z = jax.random.normal(kz3, (nb, G.z_dim))
            loss_main, aux = L.d_main_loss(
                G, D, params_g, params_d, x_in, mask, real, z, c, kd,
                style_mixing_prob=cfg.style_mixing_prob)
            total = loss_main
            r1 = jnp.zeros(())
            if do_dreg:
                loss_r1, r1 = L.d_r1_loss(D, params_d, mask, real, c,
                                          r1_gamma=cfg.r1_gamma)
                total = total + loss_r1 * cfg.d_reg_interval
            return total, (aux, r1, loss_main)

        d_vgrad = jax.value_and_grad(d_loss_fn, has_aux=True)
        # Dmain's run_G also lerps w_avg (reference run_G has no skip
        # flag); its base is the post-G-phase value params_g now carries
        w0d = (params_g["mapping"]["w_avg"] if has_wa
               else jnp.zeros((0,)))
        if A == 1:
            (_, (d_aux, r1_pen, d_main)), d_grads = d_vgrad(
                state["params_d"], x_in, mask, real, (k_z3, k_d))
            if chain_wa and d_aux.get("w_avg") is not None:
                params_g["mapping"]["w_avg"] = d_aux["w_avg"]
        else:
            def d_round(carry, inp):
                dacc, wa = carry
                x_mb, m_mb, r_mb, keys = inp
                (_, (aux, r1, main)), grads = d_vgrad(
                    state["params_d"], x_mb, m_mb, r_mb, keys)
                dacc = jax.tree.map(jnp.add, dacc, grads)
                if chain_wa and aux.get("w_avg") is not None:
                    wa = aux["w_avg"] + beta * (wa - w0d)
                return (dacc, wa), (aux["scores_real"], aux["scores_fake"],
                                    r1, main)

            split = lambda t: t.reshape((A, nm) + t.shape[1:])
            keys = tuple(jax.random.split(k, A) for k in (k_z3, k_d))
            dacc0 = jax.tree.map(jnp.zeros_like, state["params_d"])
            (dacc, wad), (sr, sf, r1s, mains) = lax.scan(
                d_round, (dacc0, w0d), (split(x_in), split(mask),
                                        split(real), keys))
            d_grads = jax.tree.map(lambda t: t / A, dacc)
            if chain_wa:
                params_g["mapping"]["w_avg"] = wad
            d_aux = {"scores_real": sr.mean(), "scores_fake": sf.mean()}
            r1_pen = r1s.mean()
            d_main = mains.mean()
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
