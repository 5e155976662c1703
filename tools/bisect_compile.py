"""Bisect the opaque remote-compile failure (HTTP 500: tpu_compile_helper
subprocess exit code 1) that caps batch size at 96 (256² model) and 16
(1024² model).  Known facts (CLAUDE.md): plain comodgan fails too (SHU not
involved); 96 compiles fine at 256², 120/128 do not; 24/32 fail at 1024²
both folded and unfolded.

Strategy: compile each model PIECE in its own subprocess (a helper failure
poisons nothing) at the failing batch size, halving scope until the
smallest failing op is found.  AOT-lower and ``.compile()`` only — no
execution, no input upload, so each probe costs only helper time.

Usage:
  python tools/bisect_compile.py --res 256 --bs 120 --stage enc
  python tools/bisect_compile.py --res 256 --bs 120 --stage syn
  python tools/bisect_compile.py --res 256 --bs 120 --stage gen
  python tools/bisect_compile.py --list       # show stages
Stages print PASS/FAIL + wall time; see main() for the scope of each.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def _cfgs(res, bf16=True):
    from shgan_tpu.runtime.config import model_cfg_bank
    bank = model_cfg_bank()
    cfg = bank(f"shgan_g{res}")
    if bf16:
        cfg["args"]["encoder"]["args"]["use_fp16_before_res"] = 16
        cfg["args"]["synthesis"]["args"]["use_fp16_after_res"] = 16
    return cfg


def build(stage, res, bs, bf16=True):
    """Return (fn, example_args) for one compile scope."""
    import jax
    import jax.numpy as jnp
    from shgan_tpu.models import get_model

    cfg = _cfgs(res, bf16)
    G = get_model(cfg)
    key = jax.random.key(0)

    if stage == "gen":                      # whole generator
        params = jax.eval_shape(G.init, key)
        def fn(params, x, z, k):
            return G(params, x, z, noise_mode="random", rng=k)
        x = jax.ShapeDtypeStruct((bs, 4, res, res), jnp.float32)
        z = jax.ShapeDtypeStruct((bs, G.z_dim), jnp.float32)
        return fn, (params, x, z, key)

    E, S, M = G.encoder, G.synthesis, G.mapping
    x = jax.ShapeDtypeStruct((bs, 4, res, res), jnp.float32)
    eparams = jax.eval_shape(E.init, key)

    if stage == "enc":                      # encoder alone
        def fn(eparams, x, k):
            return E(eparams, x, rng=k)
        return fn, (eparams, x, key)

    if stage == "syn":                      # synthesis alone; input shapes
        sparams = jax.eval_shape(S.init, key)   # derived via eval_shape
        xg, feats = jax.eval_shape(lambda p, x: E(p, x), eparams, x)
        mparams = jax.eval_shape(M.init, key)
        ws = jax.eval_shape(
            lambda p, z: M(p, z, None), mparams,
            jax.ShapeDtypeStruct((bs, G.z_dim), jnp.float32))
        def fn(sparams, xg, feats, ws, k):
            return S(sparams, xg, feats, ws, noise_mode="random", rng=k)
        return fn, (sparams, xg, feats, ws, key)

    raise SystemExit(f"unknown stage {stage}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--bs", type=int, default=120)
    ap.add_argument("--stage", default="gen")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="smoke mode: config-level CPU pin (env alone is "
                         "ignored once the axon plugin is importable)")
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_comp_cache")
    fn, args = build(a.stage, a.res, a.bs, bf16=not a.fp32)
    t0 = time.time()
    try:
        lowered = jax.jit(fn).lower(*args)
        lowered.compile()
        print(f"PASS stage={a.stage} res={a.res} bs={a.bs} "
              f"({time.time()-t0:.0f}s)")
    except Exception as e:
        print(f"FAIL stage={a.stage} res={a.res} bs={a.bs} "
              f"({time.time()-t0:.0f}s): {type(e).__name__}: "
              f"{str(e)[:200]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
