"""Shape probe for the PERMANENTLY-folded (space-to-depth) high-res trunk.

Hypothesis (round 4): the low-channel high-res convs (64ch@512^2,
32ch@1024^2) are MXU lane-starved (C_out < 128) — tools/profile_512.py
measured enc-b512 conv0 at ~42 TF/s useful while 256/512-ch levels reach
107-180.  Folding 2x2 spatial phases into channels for the WHOLE trunk
makes every conv lane-full at 4x channels / quarter spatial.  Exact
kernel transforms (ops/folded.py once this wins):

  stride-1 3x3 C->C   = one 3x3 coarse conv 4C->4C   (4.00x nominal)
                      or two 2x3 coarse convs 4C->2C (1.33x nominal)
  down s2 3x3 Ci->Co  = one 2x2 coarse conv 4Ci->Co  (1.78x nominal)
  up   x2 3x3 Ci->Co  = one 2x2 coarse conv Ci->4Co  (1.78x nominal,
                        output stays folded: NO interleave copy — the
                        layout-level idea docs/perf_ab.json record 17
                        demanded before re-attempting subpixel)
  FIR blurs           = folded shift-and-add (bandwidth-bound, not timed
                        here)

Earlier refuted attempts (perf_ab records 16-18) all paid a per-conv
pack/unpack or interleave; the permanent fold pays one s2d of the 4-ch
input and one d2s of the 3-ch output per forward.

Timing method: each case is an 8-step lax.scan chain of shape-preserving
steps inside ONE jit (the ~3-5 ms per-dispatch floor on the tunneled
backend swamps single-conv calls — first probe version was
floor-dominated at every row).  up/down cases are timed as a
down-then-up roundtrip chain at constant coarse res.

Usage: python tools/bench_folded.py [--bs 32] [--fp32] [--steps 8]
"""

from __future__ import annotations

import argparse
import functools
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.jax_comp_cache")


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)  # scalar fence (see CLAUDE.md: block_until_ready unreliable)
    return (time.perf_counter() - t0) / iters


def conv(x, w, stride=1, lhs_dilation=1, pad=None):
    kh = w.shape[2]
    if pad is None:
        pad = (kh - 1) // 2
    if lhs_dilation > 1:
        pad_lo = kh - 1 - pad
        pad_hi = pad + lhs_dilation - 1
        padding = [(pad_lo, pad_hi)] * 2
    elif isinstance(pad, int):
        padding = [(pad, pad)] * 2
    else:
        padding = pad  # [(plo_h, phi_h), (plo_w, phi_w)] asymmetric
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        lhs_dilation=(lhs_dilation, lhs_dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=x.dtype)


def chain(step, x0, steps):
    def body(x, _):
        return step(x), None
    y, _ = jax.lax.scan(body, x0, None, length=steps)
    return y[0, 0, 0, 0].astype(jnp.float32)


def dev_randn(key, shape, dtype):
    return jax.jit(functools.partial(
        jax.random.normal, shape=shape, dtype=dtype))(key)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--iters", type=int, default=6)
    a = ap.parse_args()
    bs, steps = a.bs, a.steps
    dt = jnp.float32 if a.fp32 else jnp.bfloat16
    key = jax.random.key(0)
    print(f"backend={jax.default_backend()} bs={bs} steps={steps} "
          f"dtype={dt.__name__}", flush=True)

    def report(name, t, useful, nominal):
        print(f"  {name:30s} {t*1e3:9.3f} ms  useful {useful/t/1e12:7.1f} "
              f"TF/s  nominal {nominal/t/1e12:7.1f} TF/s", flush=True)

    def run(name, xshape, step, useful_per_step, nominal_per_step):
        x = dev_randn(jax.random.fold_in(key, 1), xshape, dt)
        fn = jax.jit(lambda x: chain(step, x, steps))
        t = timeit(fn, x, iters=a.iters)
        report(name, t / steps, useful_per_step, nominal_per_step)
        del x

    wk = jax.random.fold_in(key, 2)

    # ---- calibration: the shape XLA loves (512ch@64, in-model ~177TF/s)
    cal_c, cal_res = 512, 64
    cal_useful = 2 * bs * cal_res * cal_res * cal_c * cal_c * 9
    w_cal = dev_randn(wk, (cal_c, cal_c, 3, 3), dt)
    run(f"s1 {cal_c}ch@{cal_res} direct 3x3 (cal)",
        (bs, cal_c, cal_res, cal_res),
        lambda x, w=w_cal: conv(x, w), cal_useful, cal_useful)

    # ---- stride-1 3x3 C->C at res^2 ----------------------------------
    for res, c, b in ((512, 64, bs), (1024, 32, max(bs // 4, 4)),
                      (256, 128, bs)):
        useful = 2 * b * res * res * c * c * 9
        h = res // 2
        w_f = dev_randn(wk, (c, c, 3, 3), dt)
        run(f"s1 {c}ch@{res} b{b} direct 3x3", (b, c, res, res),
            lambda x, w=w_f: conv(x, w), useful, useful)
        wA = dev_randn(wk, (4 * c, 4 * c, 3, 3), dt)
        run(f"s1 {c}ch@{res} b{b} foldA 3x3", (b, 4 * c, h, h),
            lambda x, w=wA: conv(x, w), useful, useful * 4)
        # variant B: two 2x3 convs 4C->2C (asymmetric conv padding, no
        # explicit pads), concat back to 4C (chainable)
        wB1 = dev_randn(wk, (2 * c, 4 * c, 2, 3), dt)
        wB2 = dev_randn(jax.random.fold_in(wk, 1), (2 * c, 4 * c, 2, 3), dt)

        def stepB(x, w1=wB1, w2=wB2):
            # rows {-1,0} for phase qi=0, rows {0,1} for qi=1
            y0 = conv(x, w1, pad=[(1, 0), (1, 1)])
            y1 = conv(x, w2, pad=[(0, 1), (1, 1)])
            return jnp.concatenate([y0, y1], axis=1)

        run(f"s1 {c}ch@{res} b{b} foldB 2x(2x3)", (b, 4 * c, h, h), stepB,
            useful, useful * 4 // 3)

    # ---- down(s2 3x3 Ci->Co) then up(x2 3x3 Co->Ci) roundtrips --------
    for res, ci, co in ((512, 64, 128), (1024, 32, 64)):
        b = bs if res < 1024 else max(bs // 4, 4)
        h = res // 2
        # useful per roundtrip step: down 9*Ci*Co @ h^2  + up 9*Co*Ci @ h^2
        useful = 2 * b * h * h * ci * co * 9 * 2
        wd = dev_randn(wk, (co, ci, 3, 3), dt)
        wu = dev_randn(wk, (ci, co, 3, 3), dt)

        def step_direct(x, wd=wd, wu=wu):
            y = conv(x, wd, stride=2)           # (b,co,h,h)
            return conv(y, wu, lhs_dilation=2)  # (b,ci,res,res)

        run(f"dn+up {ci}<->{co}@{res} b{b} direct", (b, ci, res, res),
            step_direct, useful, useful)

        wdf = dev_randn(wk, (co, 4 * ci, 2, 2), dt)
        wuf = dev_randn(wk, (4 * ci, co, 2, 2), dt)

        def step_fold(x, wd=wdf, wu=wuf):
            y = conv(x, wd, pad=[(1, 0), (1, 0)])   # (b,co,h,h)
            return conv(y, wu, pad=[(0, 1), (0, 1)])  # (b,4ci,h,h)

        run(f"dn+up {ci}<->{co}@{res} b{b} folded", (b, 4 * ci, h, h),
            step_fold, useful, useful * 16 // 9)


if __name__ == "__main__":
    main()
