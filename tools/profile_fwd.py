"""Component-level timing of the SH-GAN 512 forward pass on the current
JAX backend, plus an NCHW-vs-NHWC conv layout microbenchmark.

Each timed closure returns only a tiny device-side scalar so the tunnel
transfer cost does not pollute the measurement; a 1-element readback is the
sync fence.

Usage:  python tools/profile_fwd.py [--bs 16] [--res 512] [--bf16]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        np.asarray(jax.block_until_ready(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.block_until_ready(out))
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

    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(bs, 3, res, res).astype(np.float32))
    mask = jnp.asarray((rng.rand(bs, 1, res, res) > 0.5).astype(np.float32))
    z = jnp.asarray(rng.randn(bs, G.z_dim).astype(np.float32))
    key = jax.random.key(1)

    x_in = jnp.concatenate([mask - 0.5, real * mask], axis=1)

    @jax.jit
    def full(params, x, z, key):
        img = G(params, x, z, noise_mode="random", rng=key)
        return img.sum()

    @jax.jit
    def mapping_only(params, z):
        ws = G.mapping(params["mapping"], z, None)
        return ws.sum()

    @jax.jit
    def encoder_only(params, x, key):
        x_global, feats = G.encoder(params["encoder"], x, rng=key)
        return x_global.sum() + sum(f.sum() for f in feats.values())

    @jax.jit
    def synthesis_only(params, x, z, key):
        ws = G.mapping(params["mapping"], z, None)
        x_global, feats = G.encoder(params["encoder"], x, rng=key)
        img = G.synthesis(params["synthesis"], x_global, feats, ws,
                          noise_mode="random", rng=key)
        return img.sum()

    t_full = timeit(full, params, x_in, z, key)
    t_map = timeit(mapping_only, params, z)
    t_enc = timeit(encoder_only, params, x_in, key)
    t_syn_all = timeit(synthesis_only, params, x_in, z, key)
    print(f"bs={bs} res={res} bf16={bf16}")
    print(f"  full fwd          : {t_full*1e3:8.2f} ms  "
          f"({bs/t_full:7.1f} img/s)")
    print(f"  mapping           : {t_map*1e3:8.2f} ms")
    print(f"  mapping+encoder   : {t_enc*1e3:8.2f} ms  (encoder+SHU)")
    print(f"  map+enc+synthesis : {t_syn_all*1e3:8.2f} ms  "
          f"(synthesis ≈ {(t_syn_all-t_enc)*1e3:.2f} ms)")


def profile_layout(bf16):
    """Time a 3x3 conv at representative (C, H) shapes in both layouts."""
    from jax import lax
    dt = jnp.bfloat16 if bf16 else jnp.float32
    shapes = [(512, 64), (512, 32), (256, 128), (128, 256), (64, 512)]
    bs = 16
    print(f"layout microbench (bs={bs}, 3x3 conv, dtype={dt.__name__})")
    for C, H in shapes:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(bs, C, H, H).astype(np.float32), dtype=dt)
        w = jnp.asarray(rng.randn(C, C, 3, 3).astype(np.float32) * 0.05,
                        dtype=dt)

        @jax.jit
        def conv_nchw(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW")).sum()

        xh = jnp.transpose(x, (0, 2, 3, 1))
        wh = jnp.transpose(w, (2, 3, 1, 0))

        @jax.jit
        def conv_nhwc(xh, wh):
            return lax.conv_general_dilated(
                xh, wh, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")).sum()

        t1 = timeit(conv_nchw, x, w)
        t2 = timeit(conv_nhwc, xh, wh)
        flops = 2 * bs * C * C * 9 * H * H
        print(f"  C={C:4d} H={H:4d}: NCHW {t1*1e3:7.3f} ms "
              f"({flops/t1/1e12:5.1f} TF/s) | NHWC {t2*1e3:7.3f} ms "
              f"({flops/t2/1e12:5.1f} TF/s)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--layout-only", action="store_true")
    ap.add_argument("--components-only", action="store_true")
    a = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices()[0])
    if not a.components_only:
        profile_layout(a.bf16)
    if not a.layout_only:
        profile_components(a.bs, a.res, a.bf16)
