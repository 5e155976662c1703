"""Capture an on-device profiler trace of the g512 bench forward and emit
a per-HLO-op time table (the in-model attribution the isolated per-block
timers in tools/profile_512.py cannot give: their per-call dispatch floor
through the tunnel is ~3.5 ms, which swamps every small block).

Two phases, so the expensive part is reusable:
  1. run the jitted bench forward under ``jax.profiler.trace`` →
     ``<out>/plugins/profile/<run>/*.xplane.pb``
  2. parse the xplane with xprof's bundled converter and print the top-K
     self-time HLO ops (tool ``hlo_stats``), grouped by program.

Usage:
  python tools/trace_fwd.py [--bs 120] [--res 512] [--fp32] [--iters 4]
                            [--out /tmp/xprof_fwd] [--parse-only]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def capture(out_dir, bs, res, bf16, iters, fold):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_comp_cache")
    from shgan_tpu.runtime.config import model_cfg_bank
    from shgan_tpu.models import get_model

    cfg = model_cfg_bank()(f"shgan_g{res}")
    if bf16:
        cfg["args"]["encoder"]["args"]["use_fp16_before_res"] = 16
        cfg["args"]["synthesis"]["args"]["use_fp16_after_res"] = 16
    if fold:
        thr = max(int(cfg["args"]["encoder"]["args"].get("ch_base", 16384))
                  // (2 * fold), 4)
        if res > thr:
            cfg["args"]["encoder"]["args"]["fold_above_res"] = thr
            cfg["args"]["synthesis"]["args"]["fold_above_res"] = thr
            print(f"folded levels: res > {thr}", flush=True)
    G = get_model(cfg)
    params = jax.device_put(G.init(jax.random.key(0)))
    key = jax.random.key(1)

    @jax.jit
    def full(params, k):
        k1, k2, k3 = jax.random.split(k, 3)
        real = jax.random.normal(k1, (bs, 3, res, res), jnp.float32)
        mask = (jax.random.uniform(k2, (bs, 1, res, res)) > 0.5).astype(
            jnp.float32)
        z = jax.random.normal(k3, (bs, G.z_dim), jnp.float32)
        x = jnp.concatenate([mask - 0.5, real * mask], axis=1)
        return G(params, x, z, noise_mode="random", rng=k)[0, 0, 0, 0]

    print(f"backend={jax.default_backend()} bs={bs} res={res} bf16={bf16}",
          flush=True)
    # compile + warm (outside the trace)
    np.asarray(full(params, key))
    import time
    t0 = time.perf_counter()
    for i in range(iters):
        r = full(params, jax.random.fold_in(key, i))
    np.asarray(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"steady-state: {dt*1e3:.2f} ms ({bs/dt:.1f} img/s)", flush=True)

    with jax.profiler.trace(out_dir):
        for i in range(iters):
            r = full(params, jax.random.fold_in(key, 100 + i))
        np.asarray(r)
    print(f"trace written to {out_dir}", flush=True)


def parse(out_dir, top, tool):
    """Print the top self-time HLO ops from the captured xplane."""
    paths = sorted(glob.glob(osp.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {out_dir}")
    path = paths[-1]
    print(f"parsing {path}", flush=True)
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data([path], tool, {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    obj = json.loads(data)
    # gviz table: {cols: [...], rows: [{c: [{v: ...}, ...]}]} or a list
    if isinstance(obj, list):
        obj = obj[0]
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]
    rows = [[(cell or {}).get("v") for cell in row["c"]]
            for row in obj["rows"]]
    return cols, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=120)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--fold", type=int, default=0,
                    help="fold C<=this levels (0 = off)")
    ap.add_argument("--out", default="/tmp/xprof_fwd")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--tool", default="hlo_stats")
    ap.add_argument("--top", type=int, default=40)
    a = ap.parse_args()

    if not a.parse_only:
        capture(a.out, a.bs, a.res, not a.fp32, a.iters, a.fold)

    cols, rows = parse(a.out, a.top, a.tool)
    print("columns:", cols, flush=True)
    # find the self-time column to sort by
    sort_idx = None
    for key in ("Total self time (us)", "total_self_time",
                "Avg. self time (us)", "occurrences"):
        if key in cols:
            sort_idx = cols.index(key)
            break
    if sort_idx is None:
        for i, c in enumerate(cols):
            if c and "self" in str(c).lower() and "time" in str(c).lower():
                sort_idx = i
                break
    if sort_idx is not None:
        rows.sort(key=lambda r: -(r[sort_idx] or 0))
    for row in rows[:a.top]:
        print(" | ".join(str(v)[:60] for v in row), flush=True)


if __name__ == "__main__":
    main()
