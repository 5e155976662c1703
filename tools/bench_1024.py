"""Microbenchmark of the 1024²-level ops that starve the MXU (VERDICT r2
weak #1: 13% MFU at 1024² vs 43% at 512²).

The full-size channel plan gives the top pyramid level only 32 channels
(`min(ch_base//res, ch_max)` = 32768//1024), so its convs run as implicit
GEMMs with C_out=32 — 25% MXU lane fill — over 1M-pixel maps.  This tool
times each candidate formulation so the ledger records wins AND losses
(docs/perf_ab.json).  Inputs are pre-generated device-resident arrays;
the timed jits contain ONLY the op under test (a jax.random.normal of a
[8,32,1024²] tensor costs more than the conv itself and must not sit in
the timed graph).  Scalar-readback fences (tunnel-safe).

Usage: python tools/bench_1024.py [--bs 8] [--fp32]
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
from jax import lax

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def _fence(r):
    # tiny on-device scalar slice, then host readback of 1 element — the
    # tunnel-safe fence (np.asarray(full) would drag the whole tensor
    # through the ~30 MB/s post-execution link)
    np.asarray(r[(0,) * r.ndim])


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        _fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _fence(r)
    return (time.perf_counter() - t0) / iters


def report(name, t, flops, bytes_moved, bs):
    tf = flops / t / 1e12
    gb = bytes_moved / t / 1e9
    print(f"  {name:42s}: {t*1e3:8.2f} ms  {tf:6.1f} TF/s  "
          f"{gb:6.0f} GB/s  ({bs/t:7.1f} img/s-equiv)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--fp32", action="store_true")
    a = ap.parse_args()
    bs = a.bs
    # persistent compile cache (works through the remote helper; reruns
    # of these probe graphs then compile in ~ms)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    dt = jnp.float32 if a.fp32 else jnp.bfloat16
    dsize = 4 if a.fp32 else 2
    print("backend:", jax.default_backend(), jax.devices()[0],
          "dtype:", dt.__name__, "bs:", bs, flush=True)

    C, H = 32, 1024
    gen = jax.jit(lambda k, shape, d: jax.random.normal(k, shape, d),
                  static_argnums=(1, 2))
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    x_nchw = gen(ks[0], (bs, C, H, H), dt)
    w33 = gen(ks[1], (C, C, 3, 3), dt) * 0.05
    x_nhwc = jnp.transpose(x_nchw, (0, 2, 3, 1))
    w_hwio = jnp.transpose(w33, (2, 3, 1, 0))
    x_s2d = gen(ks[2], (bs, C * 4, H // 2, H // 2), dt)
    w22 = gen(ks[3], (C * 4, C * 4, 2, 2), dt) * 0.05
    x_515 = gen(ks[4], (bs, 64, H // 2, H // 2), dt)
    jax.block_until_ready((x_nchw, x_nhwc, x_s2d, x_515))

    flops = 2 * bs * C * C * 9 * H * H
    byts = bs * C * H * H * dsize * 2

    # ---- a. plain 3x3 conv 32→32 @1024² -------------------------------
    @jax.jit
    def conv_nchw(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    @jax.jit
    def conv_nhwc(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report("3x3 32->32 @1024^2 NCHW", timeit(conv_nchw, x_nchw, w33),
           flops, byts, bs)
    report("3x3 32->32 @1024^2 NHWC", timeit(conv_nhwc, x_nhwc, w_hwio),
           flops, byts, bs)

    # ---- b. batch-into-channels (VERDICT r3 #4): fold G=4 images into
    # the channel dim so the contraction/output lanes see 128 channels.
    # Two exact mappings: grouped conv (same FLOPs, but groups compute
    # per-group → lanes still 32) and block-diagonal dense weight (full
    # 128-lane fill bought with 4× padded FLOPs).  TF/s reported against
    # USEFUL flops, so ≥1× img/s-equiv is the only win condition. --------
    if bs % 4 == 0:
        Gf = 4
        xg = x_nchw.reshape(bs // Gf, Gf * C, H, H)
        wg = jnp.tile(w33, (Gf, 1, 1, 1))           # [G*C, C, 3, 3]
        wb = np.zeros((Gf * C, Gf * C, 3, 3), np.float32)
        for g in range(Gf):
            wb[g * C:(g + 1) * C, g * C:(g + 1) * C] = np.asarray(
                w33, np.float32)
        wb = jnp.asarray(wb, dt)
        jax.block_until_ready((xg, wg, wb))

        @jax.jit
        def conv_grouped(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=Gf)

        report("  batch->ch grouped 4x(32->32)",
               timeit(conv_grouped, xg, wg), flops, byts, bs)
        report("  batch->ch blockdiag 128->128 (4x pad)",
               timeit(conv_nchw, xg, wb), flops, byts, bs)
    # dense s2d kernel needs 3x3 cell support = 4x the FLOPs; this probes
    # what XLA achieves on the 128-channel shape) -----------------------
    @jax.jit
    def conv_s2d(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    flops_s2d = 2 * bs * (C * 4) ** 2 * 4 * (H // 2) ** 2
    report("  s2d-shape 2x2 128->128 @512^2", timeit(conv_s2d, x_s2d, w22),
           flops_s2d, byts, bs)

    # ---- d. the Pallas direct conv (ops/conv1024.py) ------------------
    try:
        from shgan_tpu.ops.conv1024 import conv3x3_lowch

        f = jax.jit(functools.partial(conv3x3_lowch))
        t = timeit(f, x_nchw, w33)
        report("  pallas conv3x3 @1024^2", t, flops, byts, bs)
        # correctness vs XLA on a device-sliced window (full readback
        # would drag 512 MB through the tunnel)
        sl = (slice(0, 1), slice(None), slice(100, 108), slice(None))
        want = np.asarray(conv_nchw(x_nchw, w33)[sl], np.float32)
        got = np.asarray(f(x_nchw, w33)[sl], np.float32)
        err = np.abs(want - got).max()
        print(f"    max abs err vs XLA conv (slice): {err:.3e}")
    except ImportError:
        print("  (no pallas conv1024 kernel yet)")
    except Exception as e:
        print(f"  pallas conv1024 failed: {type(e).__name__}: "
              f"{str(e)[:200]}")

    # ---- e. modulated up-conv 64→32 (the real block's first conv) -----
    from shgan_tpu.ops.modulated_conv import modulated_conv2d

    wup = gen(ks[5], (C, 64, 3, 3), jnp.float32) * 0.05
    sup = gen(ks[6], (bs, 64), jnp.float32) * 0.1 + 1
    fir = jnp.ones((4, 4)) / 16
    jax.block_until_ready((wup, sup))

    @jax.jit
    def upconv(x, w, s):
        return modulated_conv2d(x, w, s, up=2, resample_filter=fir)

    f_up = 2 * bs * 64 * C * 9 * H * H
    b_up = bs * (64 * (H // 2) ** 2 + C * H * H) * dsize
    report("mod up-conv 64->32 512->1024", timeit(upconv, x_515, wup, sup),
           f_up, b_up, bs)

    # ---- f. the real b1024 synthesis block ----------------------------
    from shgan_tpu.models.synthesis import StyleGANSynthesisBlock as _SB
    blk = _SB(64, 32, w_dim=512, resolution=1024, rgb_n=3,
              use_fp16=not a.fp32)
    p = blk.init(jax.random.key(1))
    img0 = gen(ks[7], (bs, 3, H // 2, H // 2), jnp.float32)
    ws = gen(ks[7], (bs, blk.num_conv + blk.num_torgb, 512), jnp.float32)
    jax.block_until_ready((img0, ws))

    @jax.jit
    def block(p, x, img, ws):
        x2, img2 = blk(p, x, img, ws, noise_mode="const")
        return img2

    t_blk = timeit(block, p, x_515, img0, ws)
    f_blk = f_up + flops + 2 * bs * C * 3 * H * H
    print(f"  real b1024 block                          : {t_blk*1e3:8.2f} ms"
          f"  ({bs/t_blk:7.1f} img/s-equiv, "
          f"{f_blk/t_blk/1e12:5.1f} TF/s analytic)", flush=True)


if __name__ == "__main__":
    main()
