"""Component-level timing of the SH-GAN 512 forward pass on the current
JAX backend, plus an NCHW-vs-NHWC conv layout microbenchmark.

Tunnel-safety: ALL inputs are generated on-device (jax.random) and every
timed closure returns a tiny scalar — no bulk host<->device transfers, which
on tunneled TPU backends dwarf the compute being measured.

Usage:  python tools/profile_fwd.py [--bs 32] [--res 512] [--bf16]
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


def timeit(fn, *args, iters=6, warmup=2):
    # np.asarray readback of the scalar result is the sync fence —
    # block_until_ready is not reliable on tunneled TPU backends, and the
    # TPU executes queued programs in order, so fetching the last result
    # bounds the whole run.
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters


def profile_components(bs, res, bf16):
    from shgan_tpu.runtime.config import model_cfg_bank
    from shgan_tpu.models import get_model

    cfg = model_cfg_bank()(f"shgan_g{res}")
    if bf16:
        cfg["args"]["encoder"]["args"]["use_fp16_before_res"] = 16
        cfg["args"]["synthesis"]["args"]["use_fp16_after_res"] = 16
    G = get_model(cfg)
    params = G.init(jax.random.key(0))
    params = jax.device_put(params)

    key = jax.random.key(1)

    def make_inputs(k):
        k1, k2, k3 = jax.random.split(k, 3)
        real = jax.random.normal(k1, (bs, 3, res, res), jnp.float32)
        mask = (jax.random.uniform(k2, (bs, 1, res, res)) > 0.5)\
            .astype(jnp.float32)
        z = jax.random.normal(k3, (bs, G.z_dim), jnp.float32)
        return jnp.concatenate([mask - 0.5, real * mask], axis=1), z

    @jax.jit
    def full(params, k):
        x, z = make_inputs(k)
        img = G(params, x, z, noise_mode="random", rng=k)
        return img.sum()

    @jax.jit
    def mapping_only(params, k):
        _, z = make_inputs(k)
        ws = G.mapping(params["mapping"], z, None)
        return ws.sum()

    @jax.jit
    def encoder_only(params, k):
        x, _ = make_inputs(k)
        x_global, feats = G.encoder(params["encoder"], x, rng=k)
        return x_global.sum() + sum(f.sum() for f in feats.values())

    t_full = timeit(full, params, key)
    t_map = timeit(mapping_only, params, key)
    t_enc = timeit(encoder_only, params, key)
    print(f"bs={bs} res={res} bf16={bf16}")
    print(f"  inputs+full fwd    : {t_full*1e3:8.2f} ms  "
          f"({bs/t_full:7.1f} img/s)")
    print(f"  inputs+mapping     : {t_map*1e3:8.2f} ms")
    print(f"  inputs+enc(+SHU)   : {t_enc*1e3:8.2f} ms")
    print(f"  synthesis (approx) : {(t_full-t_enc)*1e3:8.2f} ms")


def profile_layout(bf16, bs=16):
    """Time a 3x3 conv at representative (C, H) shapes in both layouts."""
    from jax import lax
    dt = jnp.bfloat16 if bf16 else jnp.float32
    shapes = [(512, 64), (512, 32), (256, 128), (128, 256), (64, 512)]
    print(f"layout microbench (bs={bs}, 3x3 conv, dtype={dt.__name__})")
    for C, H in shapes:
        k = jax.random.key(0)

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

        t1 = timeit(conv_nchw, k)
        t2 = timeit(conv_nhwc, k)
        flops = 2 * bs * C * C * 9 * H * H
        print(f"  C={C:4d} H={H:4d}: NCHW {t1*1e3:7.3f} ms "
              f"({flops/t1/1e12:5.1f} TF/s) | NHWC {t2*1e3:7.3f} ms "
              f"({flops/t2/1e12:5.1f} TF/s)", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--layout-only", action="store_true")
    ap.add_argument("--components-only", action="store_true")
    a = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    if not a.components_only:
        profile_layout(a.bf16)
    if not a.layout_only:
        profile_components(a.bs, a.res, a.bf16)
