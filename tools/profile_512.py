"""Per-block timing of the SH-GAN g512 forward at the bench config
(bs=120, bf16 blocks) — locates the missing MFU at 512².

Each encoder/synthesis block is timed in isolation with device-generated
inputs (tunnel-safe: the only readback is a scalar fence), alongside the
full forward, mapping, SHU, epilogue, and the torgb img-pyramid FIR
upsamples.  Analytic MAC-FLOPs per block give per-component TF/s, so the
output is a table that says which levels are MXU-starved and how much the
isolated-sum differs from the fused full model (XLA fusion gap).

Usage:  python tools/profile_512.py [--bs 120] [--res 512] [--fp32]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.jax_comp_cache")


def timeit(fn, *args, iters=8, warmup=2):
    # scalar readback is the fence (block_until_ready is unreliable on the
    # tunneled backend; programs execute in order so the last result bounds
    # the run)
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters


def dev_randn(key, shape, dtype):
    return jax.jit(lambda k: jax.random.normal(k, shape, dtype))(key)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=120)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--fp32", action="store_true")
    a = ap.parse_args()
    bs, res = a.bs, a.res
    bf16 = not a.fp32

    from shgan_tpu.runtime.config import model_cfg_bank
    from shgan_tpu.models import get_model
    from shgan_tpu.ops.upfirdn2d import upsample2d, setup_filter

    cfg = model_cfg_bank()(f"shgan_g{res}")
    if bf16:
        cfg["args"]["encoder"]["args"]["use_fp16_before_res"] = 16
        cfg["args"]["synthesis"]["args"]["use_fp16_after_res"] = 16
    import os
    if os.environ.get("SHGAN_FOLD", "0") == "1":
        # fold exactly the levels bench.py folds (same formula incl.
        # SHGAN_FOLD_CH — ADVICE r4: this tool used //128 and mislabeled
        # the shipped config)
        import bench
        bench._apply_fold(cfg, res)
        thr = cfg["args"]["encoder"]["args"].get("fold_above_res")
        print(f"folded levels: res > {thr}", flush=True)
    G = get_model(cfg)
    params = jax.device_put(G.init(jax.random.key(0)))
    enc, syn = G.encoder, G.synthesis
    key = jax.random.key(1)
    print(f"backend={jax.default_backend()} bs={bs} res={res} bf16={bf16}",
          flush=True)

    rows = []  # (name, ms, gflops_per_batch)

    def report(name, t, flops):
        rows.append((name, t * 1e3, flops / 1e9))
        tfs = flops / t / 1e12 if t > 0 else 0.0
        print(f"  {name:34s} {t*1e3:9.2f} ms  {flops/1e9:9.1f} GF "
              f"{tfs:7.1f} TF/s", flush=True)

    # ---- full forward (matches bench.py inner loop sans formatting) ----
    @jax.jit
    def full(params, k):
        k1, k2, k3 = jax.random.split(k, 3)
        real = jax.random.normal(k1, (bs, 3, res, res), jnp.float32)
        mask = (jax.random.uniform(k2, (bs, 1, res, res)) > 0.5).astype(
            jnp.float32)
        z = jax.random.normal(k3, (bs, G.z_dim), jnp.float32)
        x = jnp.concatenate([mask - 0.5, real * mask], axis=1)
        img = G(params, x, z, noise_mode="random", rng=k)
        return img[0, 0, 0, 0]

    t_full = timeit(full, params, key)
    print(f"full forward: {t_full*1e3:.2f} ms ({bs/t_full:.1f} img/s)",
          flush=True)

    dt = jnp.bfloat16 if bf16 else jnp.float32

    # ---- encoder blocks -------------------------------------------------
    print("encoder blocks:", flush=True)
    for idx, r in enumerate(enc.encode_res[:-1]):
        blk = enc.blocks[r]
        ch_i = blk.conv0.in_channels
        ch_j = blk.conv1.out_channels
        bdt = blk.dtype
        if idx == 0:
            img = dev_randn(jax.random.fold_in(key, r),
                            (bs, 4, r, r), bdt)
            x = None
            fn = jax.jit(lambda p, img: sum(
                t[0, 0, 0, 0].astype(jnp.float32)
                for t in blk(p, None, img)))
            args = (params["encoder"][f"b{r}"], img)
            flops = 2 * bs * r * r * (4 * ch_i            # fromrgb 1x1
                                      + ch_i * ch_i * 9   # conv0
                                      + ch_i * ch_j * 9 // 4)  # conv1 down
        else:
            x = dev_randn(jax.random.fold_in(key, r), (bs, ch_i, r, r), bdt)
            fn = jax.jit(lambda p, x: sum(
                t[0, 0, 0, 0].astype(jnp.float32)
                for t in blk(p, x, None)))
            args = (params["encoder"][f"b{r}"], x)
            flops = 2 * bs * r * r * (ch_i * ch_i * 9
                                      + ch_i * ch_j * 9 // 4)
        report(f"enc b{r} ({ch_i}->{ch_j})", timeit(fn, *args), flops)
        del x, args
        if idx == 0:
            del img

    # epilogue (4²)
    ep = enc.b4
    ec = ep.ic_n
    x4 = dev_randn(jax.random.fold_in(key, 4), (bs, ec, 4, 4), jnp.float32)
    fn = jax.jit(lambda p, x: ep(p, x)[0][0, 0].astype(jnp.float32))
    flops = 2 * bs * ((ec + 1) * ec * 9 * 16 + ec * 16 * enc.oc_n
                      + enc.oc_n * enc.oc_n)
    report("enc epilogue b4", timeit(fn, params["encoder"]["b4"], x4), flops)
    del x4

    # ---- SHU -------------------------------------------------------------
    shu = getattr(enc, "shu", None)
    if shu is not None:
        ch = enc.shu_channels
        r0 = enc.shu_input_res
        xin = dev_randn(jax.random.fold_in(key, 999), (bs, ch, r0, r0),
                        jnp.float32)
        fn = jax.jit(lambda p, x: sum(
            h[0, 0, 0, 0].astype(jnp.float32)
            for h in shu(p, x).values()))
        report("SHU (all hints)", timeit(fn, params["encoder"]["shu"], xin),
               0)
        del xin

    # ---- mapping ---------------------------------------------------------
    z = dev_randn(jax.random.fold_in(key, 77), (bs, G.z_dim), jnp.float32)
    fn = jax.jit(lambda p, z: G.mapping(p, z, None)[0, 0, 0])
    # 8 x 512x512 dense
    report("mapping (8x512 MLP)", timeit(fn, params["mapping"], z),
           2 * bs * 8 * 512 * 512)

    # ---- synthesis blocks -------------------------------------------------
    print("synthesis blocks:", flush=True)
    w_dim, w0_dim = syn.w_dim, syn.w0_dim
    # b4 first
    blk = syn.blocks[4]
    oc4 = blk.oc_n
    w0 = dev_randn(jax.random.fold_in(key, 1001), (bs, w0_dim), jnp.float32)
    x0 = dev_randn(jax.random.fold_in(key, 1002), (bs, oc4, 4, 4),
                   jnp.float32)
    ws1 = dev_randn(jax.random.fold_in(key, 1003), (bs, 2, w_dim),
                    jnp.float32)
    fn = jax.jit(lambda p, w0, x0, ws: sum(
        t[0, 0, 0, 0].astype(jnp.float32)
        for t in blk(p, w0, x0, ws, rng=jax.random.key(5))
        if t is not None))
    flops = 2 * bs * (w0_dim * oc4 * 16 + oc4 * oc4 * 9 * 16 + oc4 * 3 * 16)
    report("syn b4 (fc+conv+torgb)",
           timeit(fn, params["synthesis"]["b4"], w0, x0, ws1), flops)

    for r in syn.block_res[1:]:
        blk = syn.blocks[r]
        ch_i = blk.conv0.in_channels
        ch_j = blk.conv0.out_channels
        bdt = blk.dtype
        x = dev_randn(jax.random.fold_in(key, r * 7),
                      (bs, ch_i, r // 2, r // 2), bdt)
        x0_shape = ((bs, 4 * ch_j, r // 2, r // 2)
                    if getattr(blk, "folded", False) else (bs, ch_j, r, r))
        x0 = dev_randn(jax.random.fold_in(key, r * 7 + 1), x0_shape, bdt)
        img = dev_randn(jax.random.fold_in(key, r * 7 + 2),
                        (bs, 3, r // 2, r // 2), jnp.float32)
        ws3 = dev_randn(jax.random.fold_in(key, r * 7 + 3), (bs, 3, w_dim),
                        jnp.float32)
        fn = jax.jit(lambda p, x, x0, img, ws, w0: sum(
            t[0, 0, 0, 0].astype(jnp.float32)
            for t in blk(p, x, x0, img, ws, w0, rng=jax.random.key(6))))
        # conv0 up (out r²) + conv1 + torgb + img FIR upsample (bw-only)
        flops = 2 * bs * r * r * (ch_i * ch_j * 9 + ch_j * ch_j * 9
                                  + ch_j * 3)
        try:
            t = timeit(fn, params["synthesis"][f"b{r}"], x, x0, img, ws3, w0)
        except Exception as e:  # HBM ResourceExhausted on the top block
            print(f"  syn b{r} ({ch_i}->{ch_j}): SKIPPED ({type(e).__name__};"
                  " lower --bs)", flush=True)
            t = None
        if t is not None:
            report(f"syn b{r} ({ch_i}->{ch_j})", t, flops)
        del x, x0, img, ws3

    # ---- img-pyramid FIR upsample alone (bandwidth term) ------------------
    filt = setup_filter((1, 3, 3, 1))
    for r in (128, 256):
        img = dev_randn(jax.random.fold_in(key, r * 13), (bs, 3, r, r),
                        jnp.float32)
        fn = jax.jit(lambda x: upsample2d(x, filt)[0, 0, 0, 0])
        report(f"img FIR up {r}->{2*r}", timeit(fn, img), 0)
        del img

    total = sum(ms for _, ms, _ in rows)
    print(f"\nsum of isolated parts: {total:.2f} ms "
          f"vs full {t_full*1e3:.2f} ms "
          f"(fusion/overhead gap {t_full*1e3-total:+.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
