"""Isolated A/B of the low-channel matmul-FIR route (ops/upfirdn2d.py
``_fir_matmul``) vs the depthwise-conv formulation, on the exact 3-channel
img-pyramid shapes the 512^2/1024^2 generators run (the xprof trace
/tmp/trace512.log attributes 26.5 ms of a 336 ms bs=96 forward to the
256->512 img upsample alone; 26.3/188 ms at 1024^2).

Each case times ``upsample2d`` (the production call site,
models/synthesis.py img pyramid) under jit with on-device data and a
scalar-readback fence, in both routes, in bf16 and f32.

Usage: python tools/bench_fir3.py [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_comp_cache")

from shgan_tpu.ops.upfirdn2d import setup_filter, upsample2d, downsample2d


CASES = [
    # (label, op, N, C, H_in, dtype)
    ("up 96x3 256->512 bf16", "up", 96, 3, 256, jnp.bfloat16),
    ("up 96x3 128->256 bf16", "up", 96, 3, 128, jnp.bfloat16),
    ("up 16x3 512->1024 bf16", "up", 16, 3, 512, jnp.bfloat16),
    ("up 96x3 256->512 f32", "up", 96, 3, 256, jnp.float32),
    ("dn 96x3 512->256 bf16", "dn", 96, 3, 512, jnp.bfloat16),
]


def run_case(label, op, n, c, h, dtype, iters):
    f = setup_filter((1, 3, 3, 1))
    fn = upsample2d if op == "up" else downsample2d

    res = {}
    for route in ("conv", "matmul"):
        os.environ["SHGAN_FIR_MATMUL"] = "1" if route == "matmul" else "0"

        @jax.jit
        def step(k):
            x = jax.random.normal(k, (n, c, h, h), dtype)
            return fn(x, f)[0, 0, 0, 0]

        k = jax.random.key(0)
        np.asarray(step(k))  # compile + warm
        t0 = time.perf_counter()
        for i in range(iters):
            r = step(jax.random.fold_in(k, i))
        np.asarray(r)
        dt = (time.perf_counter() - t0) / iters * 1e3
        res[route] = dt
    res["speedup"] = res["conv"] / res["matmul"]
    print(f"{label:28s} conv {res['conv']:8.3f} ms  "
          f"matmul {res['matmul']:8.3f} ms  -> {res['speedup']:.2f}x",
          flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--json", default=None)
    a = ap.parse_args()
    print(f"backend={jax.default_backend()}", flush=True)
    out = {}
    for label, op, n, c, h, dtype in CASES:
        out[label] = run_case(label, op, n, c, h, dtype, a.iters)
    if a.json:
        with open(a.json, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
