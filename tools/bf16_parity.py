"""bf16-vs-fp32 quality bound for the throughput config.

The headline bench numbers run blocks >16² in bfloat16 (the TPU-native
spelling of the reference's fp16 knob, `configs/model/comodgan.yaml:27,46`
— shipped off there), while parity tests run fp32.  This tool measures the
deviation the bf16 config introduces on the *scored artifact* (the
mask-composited uint8 output, `shgan_default.py:257-262`) over a fixed
batch, connecting the throughput claim to the quality claim:

    python tools/bf16_parity.py [--res 512] [--bs 8] [--small] [--seed 0]

Prints one JSON line with max uint8 delta, mean |delta|, PSNR/SSIM between
the bf16 and fp32 composites, and the fraction of pixels differing by more
than 2 counts.  The measured bound lives in docs/perf_ab.json; the slow-
tier TPU test (tests/test_bf16_quality.py) re-checks it when a TPU is
available.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compare(res=512, bs=8, small=False, seed=0, noise_mode="const"):
    import jax
    import jax.numpy as jnp
    # persistent compile cache: the two full-size 512² graphs here are
    # multi-minute remote compiles, ~30 ms on a cached rerun (CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    from shgan_tpu.runtime.config import model_cfg_bank
    from shgan_tpu.models import get_model
    from shgan_tpu.models.infer import composite_forward

    suffix = "_small" if small else ""
    bank = model_cfg_bank()
    cfg32 = bank(f"shgan_g{res}{suffix}")
    cfg16 = bank(f"shgan_g{res}{suffix}")
    cfg16["args"]["encoder"]["args"]["use_fp16_before_res"] = 16
    cfg16["args"]["synthesis"]["args"]["use_fp16_after_res"] = 16

    G32 = get_model(cfg32)
    G16 = get_model(cfg16)
    params = G32.init(jax.random.key(seed))  # identical trees; fp32 master

    rng = np.random.RandomState(seed)
    real = jnp.asarray(rng.randn(bs, 3, res, res).astype(np.float32) * 0.5)
    mask = jnp.asarray((rng.rand(bs, 1, res, res) > 0.5).astype(np.float32))
    z = jnp.asarray(rng.randn(bs, G32.z_dim).astype(np.float32))
    key = jax.random.key(seed + 1)

    def run(G):
        fwd = jax.jit(lambda p, r, m, zz, k: composite_forward(
            G, p, r, m, zz, k, noise_mode=noise_mode))
        return np.asarray(fwd(params, real, mask, z, key))

    out32 = run(G32).astype(np.int32)
    out16 = run(G16).astype(np.int32)

    delta = np.abs(out32 - out16)
    # PSNR/SSIM of the two uint8 composites against each other
    mse = np.mean((out32 - out16) ** 2 / 255.0 ** 2)
    psnr = float("inf") if mse == 0 else -10 * np.log10(mse)
    from shgan_tpu.eval.ssim import compute_ssim
    ssim = float(np.mean(compute_ssim(out32 / 255.0, out16 / 255.0)))
    return {
        "res": res, "batch": bs, "small": small,
        "noise_mode": noise_mode,
        "max_u8_delta": int(delta.max()),
        "mean_abs_u8_delta": round(float(delta.mean()), 4),
        "frac_gt2": round(float((delta > 2).mean()), 6),
        "psnr_bf16_vs_fp32": round(float(psnr), 2),
        "ssim_bf16_vs_fp32": round(ssim, 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", default="const")
    args = ap.parse_args()
    rec = compare(args.res, args.bs, args.small, args.seed, args.noise)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
