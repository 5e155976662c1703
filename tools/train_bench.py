"""Training-step throughput on the current backend.

Runs the full jitted StyleGAN2/CoModGAN train step (Gmain+Dmain, with and
without the lazy-regularization phases) on synthetic data and reports
images/sec.  Usage:

    python tools/train_bench.py [--res 256] [--bs 16] [--small]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--remat", action="store_true",
                    help="per-block jax.checkpoint in G and D")
    ap.add_argument("--bf16", action="store_true",
                    help="run blocks >16² in bfloat16 (G and D) — the "
                         "reference's fp16 knob (comodgan.yaml:27,46,58), "
                         "shipped off there; measured here as the "
                         "throughput config")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    # persistent compile cache: full-model train-step compiles are
    # 15-25 min through the remote helper, ~30 ms cached (CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    from shgan_tpu.runtime.config import model_cfg_bank
    from shgan_tpu.models import get_model
    from shgan_tpu.train import TrainConfig, init_train_state, make_train_step

    print("backend:", jax.default_backend(), flush=True)
    suffix = "_small" if a.small else ""
    bank = model_cfg_bank()
    cfg_g = bank(f"shgan_g{a.res}{suffix}")
    cfg_d = bank(f"comodgan_d{a.res}{suffix}")
    if a.remat:
        for sub in ("encoder", "synthesis"):
            cfg_g["args"][sub]["args"]["remat"] = True
        cfg_d["args"]["remat"] = True
    if a.bf16:
        cfg_g["args"]["encoder"]["args"]["use_fp16_before_res"] = 16
        cfg_g["args"]["synthesis"]["args"]["use_fp16_after_res"] = 16
        cfg_d["args"]["use_fp16_before_res"] = 16
    G = get_model(cfg_g)
    D = get_model(cfg_d)
    tc = TrainConfig()
    state = init_train_state(G, D, jax.random.key(0), tc)
    step = jax.jit(make_train_step(G, D, tc),
                   static_argnames=("do_greg", "do_dreg"),
                   donate_argnums=(0,))

    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(a.bs, 3, a.res, a.res).astype(np.float32))
    mask = jnp.asarray((rng.rand(a.bs, 1, a.res, a.res) > 0.5)
                       .astype(np.float32))
    key = jax.random.key(1)
    beta = jnp.float32(0.99)

    for label, greg, dreg in [("main only", False, False),
                              ("main+greg+dreg", True, True)]:
        # real copies — the step donates its input state buffers
        s = jax.tree.map(jnp.copy, state)
        # warmup/compile
        for i in range(2):
            s, m = step(s, (real, mask), jax.random.fold_in(key, i), beta,
                        do_greg=greg, do_dreg=dreg)
            np.asarray(m["loss_g"])
        t0 = time.perf_counter()
        for i in range(a.iters):
            s, m = step(s, (real, mask), jax.random.fold_in(key, 10 + i),
                        beta, do_greg=greg, do_dreg=dreg)
        np.asarray(m["loss_g"])  # fence
        dt = (time.perf_counter() - t0) / a.iters
        print(f"{label:16s}: {dt*1e3:8.1f} ms/step  "
              f"{a.bs/dt:7.1f} img/s  (loss_g={float(m['loss_g']):.3f} "
              f"loss_d={float(m['loss_d']):.3f})", flush=True)


if __name__ == "__main__":
    main()
