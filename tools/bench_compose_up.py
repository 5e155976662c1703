"""Isolated A/B: FIR blur composed INTO the resampling conv weights vs the
split formulation (conv_transpose + separate blur / blur + strided conv).

Motivation (xprof 512² trace, 2026-08-19): the split up path costs
  fusion.117  (convT 128->64, 256->512)      10.9 ms @ 85 TF/s
  fusion.1148 (4x4 depthwise blur, 64ch)     27.5 ms @ 220 GiB/s (HBM)
i.e. the blur costs 2.5x the conv it follows because the depthwise emitter
re-reads each input row per H-tap.  Composing the blur into the transposed
conv kernel (k = conv(w, f), 3+4-1 = 6) inflates conv FLOPs 4x but deletes
the blur's 6.5 GB round-trip entirely.  Same trick already wins inside the
folded domain (ops/folded.py fold_weight_up_composed); this probes it in
the UNfolded 64/128-channel domain.

Reference behavior being optimized: conv2d_resample up=2 path
(/root/reference/lib/model_zoo/comodgan.py upsample + blur pairing,
torch_utils/ops/conv2d_resample.py:36-59).

Usage:  python tools/bench_compose_up.py   (TPU; ~4 new small compiles)
"""

from __future__ import annotations

import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def _bench(fn, args, iters=30):
    import jax
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][(0,) * 4])  # fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][(0,) * 4])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_comp_cache")
    from shgan_tpu.ops.upfirdn2d import setup_filter, upfirdn2d
    from shgan_tpu.ops.conv_resample import conv2d_resample

    rng = np.random.RandomState(0)
    f = setup_filter((1, 3, 3, 1))                      # 4-tap binomial
    f4 = np.asarray(f, np.float64)                      # [4,4], sums to 1
    results = {}

    for tag, (ci, co, h, bs) in {
        "up_256to512_128to64": (128, 64, 256, 96),
        "up_512to1024_64to32": (64, 32, 512, 16),
    }.items():
        x = jnp.asarray(rng.randn(bs, ci, h, h).astype(np.float32),
                        jnp.bfloat16)
        w = rng.randn(co, ci, 3, 3).astype(np.float32) / np.sqrt(ci * 9)

        def split(x, w=w):
            # library path: grouped convT + blur (conv_resample up=2)
            return conv2d_resample(x, jnp.asarray(w, x.dtype),
                                   f=jnp.asarray(f), up=2, padding=1)

        # composed: kernel' = 4 * conv2d(flip(w), f) (gain 4 folded in),
        # k=6.  The base w is flipped BEFORE composing because the call
        # below flips the whole composed kernel (IOHW + [::-1,::-1], the
        # transposed-conv spelling) — w's flip must cancel while f's
        # orientation stays as upfirdn applies it.  Alignment verified vs
        # conv2d_resample on CPU: pad (3,3), max rel err 1.9e-7.
        wf = np.zeros((co, ci, 6, 6), np.float32)
        wsrc = w[:, :, ::-1, ::-1]
        for a in range(3):
            for b in range(3):
                wf[:, :, a:a + 4, b:b + 4] += wsrc[:, :, a, b, None, None] \
                    * (4.0 * f4)[None, None]

        def composed(x, wf=jnp.asarray(wf)):
            # one transposed conv, stride 2, k=6; padding chosen so the
            # output grid matches split() exactly
            y = jax.lax.conv_general_dilated(
                x, jnp.asarray(wf, x.dtype).transpose(1, 0, 2, 3)[:, :, ::-1, ::-1],
                window_strides=(1, 1), padding=[(3, 3), (3, 3)],
                lhs_dilation=(2, 2),
                dimension_numbers=("NCHW", "IOHW", "NCHW"))
            return y

        a = np.asarray(split(x[:2].astype(jnp.float32)), np.float32)
        b = np.asarray(composed(x[:2].astype(jnp.float32)), np.float32)
        assert a.shape == b.shape, (a.shape, b.shape)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        t_split = _bench(split, (x,))
        t_comp = _bench(composed, (x,))
        results[tag] = dict(split_ms=round(t_split, 3),
                            composed_ms=round(t_comp, 3),
                            speedup=round(t_split / t_comp, 3),
                            rel_err=float(err))
        print(f"{tag}: split {t_split:.2f} ms, composed {t_comp:.2f} ms "
              f"-> {t_split/t_comp:.2f}x (rel_err {err:.2e})", flush=True)

    # encoder down path: blur + stride-2 conv vs composed k=6 s2 conv
    for tag, (ci, co, h, bs) in {
        "dn_512to256_64to128": (64, 128, 512, 96),
    }.items():
        x = jnp.asarray(rng.randn(bs, ci, h, h).astype(np.float32),
                        jnp.bfloat16)
        w = rng.randn(co, ci, 3, 3).astype(np.float32) / np.sqrt(ci * 9)

        def split_dn(x, w=w):
            return conv2d_resample(x, jnp.asarray(w, x.dtype),
                                   f=jnp.asarray(f), down=2, padding=1)

        wf = np.zeros((co, ci, 6, 6), np.float32)
        for a in range(3):
            for b in range(3):
                wf[:, :, a:a + 4, b:b + 4] += w[:, :, a, b, None, None] \
                    * f4[None, None]

        def composed_dn(x, wf=jnp.asarray(wf)):
            return jax.lax.conv_general_dilated(
                x, jnp.asarray(wf, x.dtype), window_strides=(2, 2),
                padding=[(2, 2), (2, 2)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        a = np.asarray(split_dn(x[:2].astype(jnp.float32)), np.float32)
        b = np.asarray(composed_dn(x[:2].astype(jnp.float32)), np.float32)
        assert a.shape == b.shape, (a.shape, b.shape)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        t_split = _bench(split_dn, (x,))
        t_comp = _bench(composed_dn, (x,))
        results[tag] = dict(split_ms=round(t_split, 3),
                            composed_ms=round(t_comp, 3),
                            speedup=round(t_split / t_comp, 3),
                            rel_err=float(err))
        print(f"{tag}: split {t_split:.2f} ms, composed {t_comp:.2f} ms "
              f"-> {t_split/t_comp:.2f}x (rel_err {err:.2e})", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
