"""Microbenchmark of the 1024²-level ops that starve the MXU (VERDICT r2
weak #1: 13% MFU at 1024² vs 43% at 512²).

The full-size channel plan gives the top pyramid level only 32 channels
(`min(ch_base//res, ch_max)` = 32768//1024), so its convs run as implicit
GEMMs with N=C_out=32 — 25% MXU lane fill — over 1M-pixel maps.  This
tool measures each candidate formulation of the 1024-level work so the
ledger records wins AND losses (docs/perf_ab.json):

  a. 3x3 conv 32→32 @1024² (XLA NCHW baseline)  + NHWC variant
  b. up-conv 64→32 512²→1024² (transposed/fir path cost)
  c. space-to-depth: the SAME conv computed at 512²/128ch via the dense
     (2,2,128,128) equivalent kernel (7x FLOPs, 4x lane fill)
  d. batched-rows reformulation: fold H-slabs into batch (halo-exchange
     free check of whether smaller spatial extents help XLA's tiling)
  e. the real model's full 1024 level (synthesis block b1024 alone)

All inputs generated on device; scalar-readback fences (tunnel-safe).

Usage: python tools/bench_1024.py [--bs 8] [--fp32]
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


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters


def report(name, t, flops, bytes_moved, bs):
    tf = flops / t / 1e12
    gb = bytes_moved / t / 1e9
    print(f"  {name:42s}: {t*1e3:8.2f} ms  {tf:6.1f} TF/s  "
          f"{gb:6.0f} GB/s  ({bs/t:6.1f} img/s-equiv)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--fp32", action="store_true")
    a = ap.parse_args()
    bs = a.bs
    dt = jnp.float32 if a.fp32 else jnp.bfloat16
    dsize = 4 if a.fp32 else 2
    print("backend:", jax.default_backend(), jax.devices()[0],
          "dtype:", dt.__name__, "bs:", bs, flush=True)

    key = jax.random.key(0)
    C, H = 32, 1024

    # ---- a. plain 3x3 conv 32→32 @1024² -------------------------------
    @jax.jit
    def conv_nchw(k):
        k1, k2 = jax.random.split(k)
        x = jax.random.normal(k1, (bs, C, H, H), dt)
        w = jax.random.normal(k2, (C, C, 3, 3), dt) * 0.05
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW")).sum()

    @jax.jit
    def conv_nhwc(k):
        k1, k2 = jax.random.split(k)
        x = jax.random.normal(k1, (bs, H, H, C), dt)
        w = jax.random.normal(k2, (3, 3, C, C), dt) * 0.05
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")).sum()

    flops = 2 * bs * C * C * 9 * H * H
    byts = bs * C * H * H * dsize * 2
    report("3x3 32->32 @1024^2 NCHW", timeit(conv_nchw, key), flops, byts, bs)
    report("3x3 32->32 @1024^2 NHWC", timeit(conv_nhwc, key), flops, byts, bs)

    # ---- c. space-to-depth dense equivalent ---------------------------
    # y = conv3x3(x) at 1024²/32ch == conv2x2(x_s2d) at 512²/128ch with a
    # dense (128,128,2,2) kernel (each output phase reads a 2x2 cell
    # neighborhood; the dense kernel embeds the 3x3 taps sparsely: 7x the
    # FLOPs at 4x the lane fill — measured here, whichever way it lands)
    C4 = C * 4

    @jax.jit
    def conv_s2d(k):
        k1, k2 = jax.random.split(k)
        x = jax.random.normal(k1, (bs, C4, H // 2, H // 2), dt)
        w = jax.random.normal(k2, (C4, C4, 2, 2), dt) * 0.05
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW")).sum()

    flops_s2d = 2 * bs * C4 * C4 * 4 * (H // 2) * (H // 2)
    report("  s2d dense 2x2 128->128 @512^2", timeit(conv_s2d, key),
           flops_s2d, byts, bs)

    # ---- d. H-slab into batch (halo-free cost probe) ------------------
    @jax.jit
    def conv_slab(k):
        k1, k2 = jax.random.split(k)
        x = jax.random.normal(k1, (bs * 4, C, H // 4, H), dt)
        w = jax.random.normal(k2, (C, C, 3, 3), dt) * 0.05
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW")).sum()

    report("  H-slabs as batch (4x256 rows)", timeit(conv_slab, key),
           flops, byts, bs)

    # ---- b. modulated up-conv 64→32 (the real block's first conv) -----
    from shgan_tpu.ops.modulated_conv import modulated_conv2d

    @jax.jit
    def upconv(k):
        k1, k2, k3 = jax.random.split(k, 3)
        x = jax.random.normal(k1, (bs, 64, H // 2, H // 2), dt)
        w = jax.random.normal(k2, (C, 64, 3, 3), jnp.float32) * 0.05
        s = jax.random.normal(k3, (bs, 64), jnp.float32) * 0.1 + 1
        return modulated_conv2d(x, w, s, up=2,
                                resample_filter=jnp.ones((4, 4)) / 16).sum()

    f_up = 2 * bs * 64 * C * 9 * H * H
    b_up = bs * (64 * (H // 2) ** 2 + C * H * H) * dsize
    report("mod up-conv 64->32 512->1024", timeit(upconv, key), f_up, b_up,
           bs)

    # ---- e. the real b1024 synthesis block ----------------------------
    from shgan_tpu.models.synthesis import SynthesisBlock
    blk = SynthesisBlock(64, 32, w_dim=512, resolution=1024, rgb_n=3,
                         use_fp16=not a.fp32)
    p = blk.init(jax.random.key(1))

    @jax.jit
    def block(p, k):
        k1, k2, k3 = jax.random.split(k, 3)
        x = jax.random.normal(k1, (bs, 64, 512, 512), dt)
        img = jax.random.normal(k2, (bs, 3, 512, 512), jnp.float32)
        ws = jax.random.normal(k3, (bs, blk.num_conv + blk.num_torgb, 512),
                               jnp.float32)
        x2, img2 = blk(p, x, img, ws, noise_mode="const")
        return x2.sum() + img2.sum()

    t_blk = timeit(block, p, key)
    f_blk = f_up + flops + 2 * bs * C * 3 * H * H  # upconv+conv+torgb
    print(f"  real b1024 block                          : {t_blk*1e3:8.2f} ms"
          f"  ({bs/t_blk:6.1f} img/s-equiv, "
          f"{f_blk/t_blk/1e12:5.1f} TF/s analytic)", flush=True)


if __name__ == "__main__":
    main()
