"""Benchmark: 512×512 inpainted images/sec/chip (the BASELINE.json north-star
metric) on the flagship full-size SH-GAN generator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is null until a measured reference figure exists.

Env knobs:
  BENCH_DEVICE=cpu       force CPU (smoke mode, tiny batch)
  BENCH_RES=256|512      resolution (default 512)
  BENCH_SMALL=1          use ch_base-16384 variant
  BENCH_BATCH=N          fixed batch size (default: auto sweep)
  BENCH_RNG=rbg          PRNG impl for noise keys (default threefry;
                         rbg uses the TPU-native RngBitGenerator)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _sweep_in_subprocesses(batches):
    """Run one bench subprocess per batch size and merge the results.

    A device OOM poisons the whole process on the tunneled TPU backend
    (every later batch fails too), so each candidate gets its own process;
    the cost is one jax init per size.  Returns the best JSON dict or None.
    """
    import subprocess
    best = None
    for bs in batches:
        env = dict(os.environ, BENCH_BATCH=str(bs))
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              capture_output=True, text=True, env=env)
        sys.stderr.write(proc.stderr)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
            else ""
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            print(f"# batch {bs} subprocess failed (rc={proc.returncode})",
                  file=sys.stderr)
            continue
        if best is None or rec["value"] > best["value"]:
            best = rec
    return best


def main():
    if (os.environ.get("BENCH_DEVICE") != "cpu"
            and not os.environ.get("BENCH_BATCH")
            and os.environ.get("BENCH_SUBPROC", "1") == "1"):
        # measured throughput climbs to batch 120 (343 img/s on v5e);
        # 128 OOMs — isolate each size so a failure can't zero the rest
        best = _sweep_in_subprocesses([120, 96])
        if best is not None:
            print(json.dumps(best))
            return
        print("# all sweep subprocesses failed; falling back in-process",
              file=sys.stderr)

    if os.environ.get("BENCH_DEVICE") == "cpu":
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    from shgan_tpu.runtime.config import model_cfg_bank
    from shgan_tpu.models import get_model

    res = int(os.environ.get("BENCH_RES", "512"))
    small = os.environ.get("BENCH_SMALL", "0") == "1"
    # throughput default: bf16 in blocks >16² (the reference's own fp16
    # knob, comodgan.yaml:27,46, shipped off there; bf16 keeps fp32 range).
    # Parity/eval paths stay fp32 — BENCH_BF16=0 measures that config.
    bf16 = os.environ.get("BENCH_BF16", "1") == "1"
    on_cpu = jax.default_backend() == "cpu"
    suffix = "_small" if small else ""
    model_name = os.environ.get("BENCH_MODEL", f"shgan_g{res}{suffix}")
    cfg = model_cfg_bank()(model_name)
    if bf16:
        # run blocks above 16x16 in bfloat16 (the reference's fp16 knob,
        # configs/model/comodgan.yaml:27,46 — shipped off; bf16 is the
        # TPU-native equivalent)
        cfg["args"]["encoder"]["args"]["use_fp16_before_res"] = 16
        cfg["args"]["synthesis"]["args"]["use_fp16_after_res"] = 16
    if jax.default_backend() == "tpu" and jax.device_count() == 1 \
            and os.environ.get("SHGAN_PALLAS_NOISE") != "0":
        # hardware-PRNG Box-Muller noise kernel (ops/noise.py): ~8% faster
        # end-to-end than threefry noise; single-chip only (pallas_call
        # does not auto-partition under pjit)
        from shgan_tpu.ops.noise import set_noise_impl
        set_noise_impl("pallas")

    G = get_model(cfg)
    params = G.init(jax.random.key(0))

    def forward(params, real, mask, z, key):
        x = jnp.concatenate([mask - 0.5, real * mask], axis=1)
        img = G(params, x, z, noise_mode="random", rng=key)
        combined = real * mask + img * (1 - mask)
        return jnp.clip(combined * 127.5 + 127.5, 0, 255).astype(jnp.uint8)

    # Timing methodology: every iteration ends with a host readback of one
    # output pixel — block_until_ready alone is not a reliable fence on
    # tunneled TPU platforms, a device→host transfer is.  The per-iteration
    # RTT (~ms) is noise against the ~100 ms step.
    fwd = jax.jit(forward)
    iters = 2 if on_cpu else 12

    if os.environ.get("BENCH_BATCH"):
        batches = [int(os.environ["BENCH_BATCH"])]
    elif on_cpu:
        batches = [2]
    else:
        # in-process fallback (BENCH_SUBPROC=0): stay well below the
        # 128-batch OOM — an OOM poisons every later batch in this process
        batches = [96, 64]

    rng = np.random.RandomState(0)
    best = 0.0
    best_bs = None
    for bs in batches:
        try:
            real = jnp.asarray(rng.randn(bs, 3, res, res).astype(np.float32))
            mask = jnp.asarray(
                (rng.rand(bs, 1, res, res) > 0.5).astype(np.float32))
            z = jnp.asarray(rng.randn(bs, G.z_dim).astype(np.float32))
            key = jax.random.key(1, impl=os.environ.get("BENCH_RNG") or None)
            # compile + warmup (2 full syncs)
            for i in range(2):
                np.asarray(fwd(params, real, mask, z,
                               jax.random.fold_in(key, 100 + i))[0, 0, 0, 0])
            t0 = time.perf_counter()
            acc = 0
            for i in range(iters):
                out = fwd(params, real, mask, z, jax.random.fold_in(key, i))
                acc += int(np.asarray(out[0, 0, 0, 0]))  # hard sync
            dt = time.perf_counter() - t0
            ips = bs * iters / dt
            print(f"# batch {bs}: {ips:.2f} img/s "
                  f"({dt / iters * 1e3:.1f} ms/step, checksum {acc})",
                  file=sys.stderr)
            if ips > best:
                best, best_bs = ips, bs
        except Exception as e:  # OOM at large batch → try smaller
            print(f"# batch {bs} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
            continue

    n_chips = max(jax.device_count(), 1)
    value = best / n_chips
    print(json.dumps({
        "metric": f"{res}x{res} inpainted images/sec/chip"
                  + (" (cpu smoke)" if on_cpu else ""),
        "value": round(value, 3),
        "unit": "img/s/chip",
        "vs_baseline": None,
        "detail": {"batch": best_bs, "backend": jax.default_backend(),
                   "chips": n_chips, "small": small},
    }))


if __name__ == "__main__":
    main()
