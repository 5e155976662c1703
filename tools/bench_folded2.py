"""Composite-op probe for the folded trunk: WHERE does the full-model
folded slowdown come from?

bench_folded.py measured bare convs (folded wins 1.5-2.6× on C≤64).  The
full folded g512 then measured 2.35× SLOWER per image (bs=64, 431 ms)
and failed to compile at bs≥96 — so the suspects are the pieces the
conv probe skipped: the folded FIR shift-adds (blur_pre_down/post_up,
odd h+1 grids) and the up/down composites that include them.

Usage: python tools/bench_folded2.py [--bs 32]
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

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.jax_comp_cache")


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters


def chain(step, x0, steps):
    def body(x, _):
        return step(x), None
    y, _ = jax.lax.scan(body, x0, None, length=steps)
    return y[0, 0, 0, 0].astype(jnp.float32)


def dev_randn(key, shape, dtype=jnp.bfloat16):
    return jax.jit(functools.partial(
        jax.random.normal, shape=shape, dtype=dtype))(key)



# --- REFUTED formulations, kept here for reproducibility ------------------
# (removed from ops/folded.py after measurement: the shift-add folded blur
# is 3x the direct depthwise cost, and the 2x2 non-composed up kernel needs
# that blur as a separate pass — the shipped path composes the FIR into a
# 3x3 coarse kernel instead, see ops/folded.py)

def _sep_taps(f):
    f = np.asarray(f, np.float64)
    if f.ndim == 1:
        t = f
    else:
        c = np.sum(f, axis=1)
        s = np.sum(f)
        t = c / np.sqrt(s) if s > 0 else c
    return [float(v) for v in t]


def _axis_shift_add(x, taps, axis, out_len, idx_map):
    n, c4, h, w = x.shape
    c = c4 // 4
    xv = x.reshape(n, 2, 2, c, h, w)
    in_len = x.shape[axis]
    pad_hi = max(out_len + 1 - in_len, 1)
    pad = [(0, 0)] * 6
    pad[axis + 2] = (1, pad_hi)
    xp = jnp.pad(xv, pad)

    def take(p, off):
        sl = [slice(None)] * 6
        sl[axis + 2] = slice(1 + off, 1 + off + out_len)
        sl[1 if axis == 2 else 2] = slice(p, p + 1)
        return xp[tuple(sl)]

    outs = []
    for q in (0, 1):
        acc = None
        for k, t in enumerate(taps):
            p, off = idx_map(q, k)
            term = take(p, off) * jnp.asarray(t, x.dtype)
            acc = term if acc is None else acc + term
        outs.append(acc)
    y = jnp.concatenate(outs, axis=1 if axis == 2 else 2)
    sh = list(y.shape)
    return y.reshape(n, 4 * c, sh[4], sh[5])


def blur_pre_down_folded(x, f):
    taps = _sep_taps(f)[::-1]

    def imap(q, k):
        d = q + k
        p = d % 2
        return p, (d - p) // 2 - 1

    h, w = x.shape[2], x.shape[3]
    x = _axis_shift_add(x, taps, 2, h + 1, imap)
    return _axis_shift_add(x, taps, 3, w + 1, imap)


def blur_post_up_folded(x, f, gain=4):
    g = float(gain) ** 0.5
    taps = [t * g for t in _sep_taps(f)[::-1]]

    def imap(q, k):
        d = q + k - 1
        p = d % 2
        return p, (d - p) // 2

    h = x.shape[2] - 1
    w = x.shape[3] - 1
    x = _axis_shift_add(x, taps, 2, h, imap)
    return _axis_shift_add(x, taps, 3, w, imap)


def fold_weight_up_2x2(w):
    """Non-composed folded up kernel (needs the separate post blur)."""
    O, I = int(w.shape[0]), int(w.shape[1])
    wf = jnp.zeros((4 * O, I, 2, 2), w.dtype)
    taps = {(0, 0): 0, (0, 2): 1, (1, 1): 1}
    for (qi, ky), R in taps.items():
        for (qj, kx), S in taps.items():
            wf = wf.at[(qi * 2 + qj) * O:(qi * 2 + qj + 1) * O, :,
                       R, S].set(w[:, :, ky, kx])
    return wf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--iters", type=int, default=6)
    a = ap.parse_args()
    bs, steps = a.bs, a.steps

    from shgan_tpu.ops import folded as F
    from shgan_tpu.ops.conv_resample import conv2d_resample, _maybe_flip
    from shgan_tpu.ops.upfirdn2d import setup_filter, upfirdn2d

    filt = setup_filter((1, 3, 3, 1))
    key = jax.random.key(0)
    print(f"backend={jax.default_backend()} bs={bs} steps={steps}",
          flush=True)

    def run(name, xshape, step):
        x = dev_randn(jax.random.fold_in(key, 1), xshape)
        fn = jax.jit(lambda x: chain(step, x, steps))
        t = timeit(fn, x, iters=a.iters) / steps
        print(f"  {name:36s} {t*1e3:9.3f} ms", flush=True)
        del x

    # ---- up(128->64)+down(64->128) roundtrip at the g512 top level ----
    wu = dev_randn(jax.random.fold_in(key, 2), (64, 128, 3, 3)) * 0.05
    wd = dev_randn(jax.random.fold_in(key, 3), (128, 64, 3, 3)) * 0.05

    def rt_direct(x):
        y = conv2d_resample(x, wu, f=filt, up=2, padding=1,
                            flip_weight=False)
        return conv2d_resample(y, wd, f=filt, down=2, padding=1)

    def rt_folded(x):
        y = F.conv_up_folded(x, _maybe_flip(wu, False), filt)
        return F.conv_down_folded(y, wd, filt)

    run("up+dn 128<->64@256c direct", (bs, 128, 256, 256), rt_direct)
    run("up+dn 128<->64@256c folded", (bs, 128, 256, 256), rt_folded)

    # ---- folded up WITHOUT the blur (conv only, kept h+1 -> crop) ----
    def up_conv_only(x):
        wf = fold_weight_up_2x2(_maybe_flip(wu, False).astype(x.dtype))
        y = jax.lax.conv_general_dilated(
            x, wf, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y[:, :128, :256, :256]  # crop to chain shape (timing only)

    run("up 128->64@256c folded CONV only", (bs, 128, 256, 256),
        up_conv_only)

    # ---- the folded blurs alone (pre-down then post-up chains) --------
    def blurs_folded(x):
        y = blur_pre_down_folded(x, filt)         # h -> h+1
        return blur_post_up_folded(y, filt)       # h+1 -> h

    run("blur pre+post 256ch@256c folded", (bs, 256, 256, 256),
        blurs_folded)

    # direct-equivalent blur cost: two depthwise FIR passes on the fine
    # 64ch@512 grid (shapes differ slightly; bandwidth-equivalent)
    def blurs_direct(x):
        y = upfirdn2d(x, filt, padding=[2, 1, 2, 1])
        return upfirdn2d(y, filt, padding=[1, 2, 1, 2])

    run("blur x2 64ch@512f direct dwise", (bs, 64, 512, 512), blurs_direct)

    # ---- s1 folded conv in REAL composition (with bias_act between) ---
    from shgan_tpu.ops.bias_act import get_activation
    act = get_activation("lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)")
    ws = dev_randn(jax.random.fold_in(key, 4), (64, 64, 3, 3)) * 0.05
    b = dev_randn(jax.random.fold_in(key, 5), (256,)) * 0.01

    def s1_folded_act(x):
        y = F.conv_s1_folded(x, ws)
        return act(y + b.astype(y.dtype)[None, :, None, None])

    run("s1 64ch folded + bias_act", (bs, 256, 256, 256), s1_folded_act)

    def s1_direct_act(x):
        y = conv2d_resample(x, ws, f=None, padding=1)
        b2 = b[:64]
        return act(y + b2.astype(y.dtype)[None, :, None, None])

    run("s1 64ch direct + bias_act", (bs, 64, 512, 512), s1_direct_act)


if __name__ == "__main__":
    main()
