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


def _cfgs(res, bf16=True, fold=False):
    from shgan_tpu.runtime.config import model_cfg_bank
    bank = model_cfg_bank()
    cfg = bank(f"shgan_g{res}")
    if bf16:
        cfg["args"]["encoder"]["args"]["use_fp16_before_res"] = 16
        cfg["args"]["synthesis"]["args"]["use_fp16_after_res"] = 16
    if fold:
        # same formula as bench.py _apply_fold (SHGAN_FOLD_CH=32 default)
        enc = cfg["args"]["encoder"]["args"]
        syn = cfg["args"]["synthesis"]["args"]
        fold_ch = int(os.environ.get("SHGAN_FOLD_CH", "32"))
        thr = max(int(enc.get("ch_base", 16384)) // (2 * fold_ch), 4)
        if int(enc.get("resolution", 0)) > thr:
            enc["fold_above_res"] = thr
            syn["fold_above_res"] = thr
    return cfg


def build(stage, res, bs, bf16=True, fold=False):
    """Return (fn, example_args) for one compile scope."""
    import jax
    import jax.numpy as jnp
    from shgan_tpu.models import get_model

    cfg = _cfgs(res, bf16, fold)
    G = get_model(cfg)
    key = jax.random.key(0)

    if stage == "gen":                      # whole generator
        params = jax.eval_shape(G.init, key)
        def fn(params, x, z, k):
            return G(params, x, z, noise_mode="random", rng=k)
        x = jax.ShapeDtypeStruct((bs, 4, res, res), jnp.float32)
        z = jax.ShapeDtypeStruct((bs, G.z_dim), jnp.float32)
        return fn, (params, x, z, key)

    if stage == "bench":                    # exactly bench.py's forward:
        # composite_forward + whatever noise impl is active (set
        # SHGAN_PALLAS_NOISE=0/1 to A/B the Pallas noise kernel)
        if os.environ.get("SHGAN_PALLAS_NOISE") != "0":
            from shgan_tpu.ops.noise import set_noise_impl
            set_noise_impl("pallas")
        from shgan_tpu.models.infer import composite_forward
        params = jax.eval_shape(G.init, key)
        def fn(params, real, mask, z, k):
            return composite_forward(G, params, real, mask, z, k,
                                     noise_mode="random")
        real = jax.ShapeDtypeStruct((bs, 3, res, res), jnp.float32)
        mask = jax.ShapeDtypeStruct((bs, 1, res, res), jnp.float32)
        z = jax.ShapeDtypeStruct((bs, G.z_dim), jnp.float32)
        return fn, (params, real, mask, z, key)

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

    if stage.startswith("syn_to:"):         # synthesis truncated at res R:
        # same channel plan, pyramid 4..R only — halves the failing scope
        R = int(stage.split(":")[1])
        scfg = dict(cfg["args"]["synthesis"])
        scfg = {"type": cfg["args"]["synthesis"]["type"],
                "args": dict(cfg["args"]["synthesis"]["args"],
                             resolution=R)}
        from shgan_tpu.models import get_model
        St = get_model(scfg)
        sparams = jax.eval_shape(St.init, key)
        xg, feats = jax.eval_shape(lambda p, x: E(p, x), eparams, x)
        feats = {r: v for r, v in feats.items() if int(r) <= R}
        nw = St.num_ws
        ws = jax.ShapeDtypeStruct((bs, nw, S.w_dim), jnp.float32)
        def fn(sparams, xg, feats, ws, k):
            return St(sparams, xg, feats, ws, noise_mode="random", rng=k)
        return fn, (sparams, xg, feats, ws, key)

    if stage.startswith("synblock:"):       # ONE synthesis block at res R
        R = int(stage.split(":")[1])
        blk = S.blocks[R]
        bparams = jax.eval_shape(blk.init, key)
        xg, feats = jax.eval_shape(lambda p, x: E(p, x), eparams, x)
        ic_n = feats[R // 2].shape[1]       # synthesis ch plan == enc skips
        xin = jax.ShapeDtypeStruct((bs, ic_n, R // 2, R // 2), jnp.float32)
        img = jax.ShapeDtypeStruct((bs, 3, R // 2, R // 2), jnp.float32)
        wsb = jax.ShapeDtypeStruct((bs, 3, S.w_dim), jnp.float32)
        w0 = jax.ShapeDtypeStruct((bs, S.w0_dim), jnp.float32)
        fR = feats[R]                       # live input, not baked constant
        def fn(bparams, xin, fR, img, wsb, w0, k):
            return blk(bparams, xin, fR, img, wsb, w0,
                       noise_mode="random", rng=k)
        return fn, (bparams, xin, fR, img, wsb, w0, key)

    raise SystemExit(f"unknown stage {stage}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--bs", type=int, default=120)
    ap.add_argument("--stage", default="gen")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--fold", action="store_true",
                    help="apply bench.py's folded-domain config "
                         "(SHGAN_FOLD=1 equivalent, fold_ch=32)")
    ap.add_argument("--cpu", action="store_true",
                    help="smoke mode: config-level CPU pin (env alone is "
                         "ignored once the axon plugin is importable)")
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_comp_cache")
    fn, args = build(a.stage, a.res, a.bs, bf16=not a.fp32, fold=a.fold)
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
