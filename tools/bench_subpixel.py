"""Microbenchmark: lhs_dilation up-conv vs phase-decomposed subpixel conv.

Hypothesis (round 4): XLA's input-dilated conv on this backend does not
recover the 4× tap sparsity of a stride-2 transposed conv (round-3
decomposition measured the 1024²-level up-conv at 14.4 TF/s *nominal* =
3.6 TF/s useful), so computing only the useful taps as one 4·C_out conv
over the coarse grid (ops/subpixel.py) should win at every up level —
and it composes with grad/pjit, unlike the Pallas paths.

Shapes probed = the model's actual up-convs: every synthesis level of
shgan_g512 (64→512 out-res) plus the 1024² level of shgan_g1024.
TF/s reported against NOMINAL transposed-conv FLOPs (k²·Cin·Cout·out²)
for both formulations so the img/s-equiv column is apples-to-apples.

Usage: python tools/bench_subpixel.py [--bs 8] [--fp32]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def _fence(r):
    np.asarray(r[(0,) * r.ndim])


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        _fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _fence(r)
    return (time.perf_counter() - t0) / iters


def report(name, t, flops, bs):
    print(f"  {name:44s}: {t*1e3:8.2f} ms  {flops/t/1e12:6.1f} TF/s-nom  "
          f"({bs/t:7.1f} img/s-equiv)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--fp32", action="store_true")
    a = ap.parse_args()
    bs = a.bs
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    dt = jnp.float32 if a.fp32 else jnp.bfloat16
    print("backend:", jax.default_backend(), jax.devices()[0],
          "dtype:", dt.__name__, "bs:", bs, flush=True)

    from shgan_tpu.ops.subpixel import conv2d_up_phase

    # (cin, cout, coarse H) — shgan_g512 synthesis up-convs (ch_base 32768,
    # ch_max 512: 512ch through 64², then 512→256→128→64 widths) + the
    # g1024 top level. pyt=0 is what conv2d_resample emits for k=3/up=2.
    shapes = [
        (512, 512, 32),   # 32→64
        (512, 512, 64),   # 64→128
        (512, 256, 128),  # 128→256
        (256, 128, 256),  # 256→512
        (128, 64, 512),   # 512→1024 (g1024)
        (64, 32, 1024),   # unused in zoo; lane-starved extreme for ledger
    ]

    p = 2  # lax-side pad for pyt=0

    for cin, cout, h in shapes:
        key = jax.random.key(hash((cin, h)) % 2**31)
        ks = jax.random.split(key, 2)
        gen = jax.jit(lambda k, s, d: jax.random.normal(k, s, d),
                      static_argnums=(1, 2))
        x = gen(ks[0], (bs, cin, h, h), dt)
        w = gen(ks[1], (cout, cin, 3, 3), dt) * 0.05
        jax.block_until_ready((x, w))
        oh = 2 * h + 1
        flops_nom = 2 * bs * cin * cout * 9 * oh * oh

        @jax.jit
        def up_xla(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), [(p, p), (p, p)], lhs_dilation=(2, 2),
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        @jax.jit
        def up_phase(x, w):
            return conv2d_up_phase(x, w, (0, 0))

        name = f"{cin}->{cout} up2 k3 @{h}^2->{2*h}^2"
        t0 = timeit(up_xla, x, w)
        report(name + " lhs_dil", t0, flops_nom, bs)
        t1 = timeit(up_phase, x, w)
        report(name + " phase  ", t1, flops_nom, bs)
        got = up_phase(x, w)
        want = up_xla(x, w)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        print(f"    speedup {t0/t1:5.2f}x   max|delta| {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
