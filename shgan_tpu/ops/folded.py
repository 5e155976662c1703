"""Space-to-depth (phase-folded) convolutions for MXU-starved levels.

The low-channel high-resolution convs of the CoModGAN/SH-GAN pyramid
(64ch@512², 32ch@1024²) leave the MXU's 128-wide lanes half/quarter
filled: tools/profile_512.py measured enc-b512 conv0 at ~42 TF/s useful
and the 1024² 32-ch convs at ~8-10, while well-shaped levels reach
140-180.  This module re-expresses those convs EXACTLY in a layout where
the 2×2 spatial phases of the fine grid live in the channel dimension
("folded": ``[N, C, H, W] → [N, 4C, H/2, W/2]``, phase-major), trading
a known nominal-FLOP inflation for full lane occupancy:

  stride-1 3×3 conv  → two 2×3 coarse convs ``4C → 2C`` (×4/3 nominal;
                       variant "B") or one 3×3 coarse conv ``4C → 4C``
                       (×4 nominal, variant "A" — wins when 4C ≤ 128,
                       i.e. 32-channel levels, because B's 2C=64 output
                       is still lane-starved)
  down   s2 3×3 conv → one 2×2 coarse conv ``4Ci → Co`` (×16/9), output
                       lands UNFOLDED at the next (coarser) level
  up     ×2 3×3 conv → one 2×2 coarse conv ``Ci → 4Co`` (×16/9), input
                       unfolded — the phases of the transposed conv
                       become output channels and are NEVER interleaved
                       (the layout-level idea docs/perf_ab.json record
                       17 required before re-attempting subpixel)
  4-tap FIR blurs    → folded shift-and-add (pure VPU/bandwidth, fused
                       by XLA), including the torgb img-pyramid
                       upsample producing folded RGB directly

Measured isolated on v5e (tools/bench_folded.py, bs=32/8 bf16 chains):
64ch@512² stride-1: 30.2 → 47.1 TF/s useful (variant B, 1.56×);
32ch@1024²: 10.5 → 26.9 (variant A, 2.56×).

Everything here is an exact linear-algebra rearrangement of the ops in
:mod:`.conv_resample` / :mod:`.upfirdn2d` (reference contract:
`/root/reference/lib/model_zoo/stylegan_utils/conv2d_resample.py:57-154`,
`upfirdn2d.py:199-233`); tests/test_folded.py checks each primitive and
the folded blocks against the direct path to float tolerance.

Phase convention: ``p = pi*2 + pj`` (row phase major), channel layout
``X[:, p*C + c]`` ("phase-major") so per-phase channel blocks stay
contiguous and fold/unfold are pure reshape-transposes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

_DN = ("NCHW", "OIHW", "NCHW")


# ---------------------------------------------------------------------------
# layout
# ---------------------------------------------------------------------------

def fold(x):
    """[N, C, H, W] → [N, 4C, H/2, W/2], phase-major (p*C + c)."""
    n, c, h, w = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(n, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 3, 5, 1, 2, 4)           # n, pi, pj, c, h/2, w/2
    return x.reshape(n, 4 * c, h // 2, w // 2)


def unfold(x):
    """Inverse of :func:`fold`."""
    n, c4, h, w = x.shape
    assert c4 % 4 == 0, c4
    c = c4 // 4
    x = x.reshape(n, 2, 2, c, h, w)
    x = x.transpose(0, 3, 4, 1, 5, 2)           # n, c, h, pi, w, pj
    return x.reshape(n, c, 2 * h, 2 * w)


def tile_channel_vec(v, reps=4):
    """Per-channel vector [···, C] → [···, reps*C] matching the
    phase-major folded channel order (bias, styles, dcoefs)."""
    return jnp.concatenate([v] * reps, axis=-1)


# ---------------------------------------------------------------------------
# weight folding (trace-time; tiny tensors)
# ---------------------------------------------------------------------------

# fine tap k ∈ {0,1,2} (offset k-1) → (phase, coarse offset R) for an
# output at fine parity q:  fine = 2y + q + (k-1) = 2(y+r) + p
def _phi(q, k):
    d = q + k - 1
    p = d % 2
    return p, (d - p) // 2


def fold_weight_s1_pair(w):
    """Fine stride-1 3×3 correlation kernel [O, I, 3, 3] → two folded
    2×3 kernels ([2O, 4I, 2, 3] each) for output row-phase qi=0 / qi=1
    (variant B).  Use with asymmetric row padding (1,0) / (0,1) and
    column padding (1,1); concat outputs on channels → phase-major 4O."""
    O, I = int(w.shape[0]), int(w.shape[1])
    dt = w.dtype
    out = []
    for qi in (0, 1):
        wf = jnp.zeros((2 * O, 4 * I, 2, 3), dt)
        for ky in range(3):
            pi, ry = _phi(qi, ky)
            R = ry + (1 if qi == 0 else 0)      # row pad (1,0) / (0,1)
            for qj in (0, 1):
                for kx in range(3):
                    pj, rx = _phi(qj, kx)
                    S = rx + 1                  # col pad (1,1)
                    wf = wf.at[
                        qj * O:(qj + 1) * O,
                        (pi * 2 + pj) * I:(pi * 2 + pj + 1) * I,
                        R, S].set(w[:, :, ky, kx])
        out.append(wf)
    return out[0], out[1]


def fold_weight_s1_full(w):
    """Variant A: fine stride-1 3×3 kernel [O, I, 3, 3] → one folded 3×3
    kernel [4O, 4I, 3, 3] (zeros at 27/36 of the taps).  Use with
    symmetric padding (1,1).  Wins when 4O ≤ 128 (32-channel levels)."""
    O, I = int(w.shape[0]), int(w.shape[1])
    wf = jnp.zeros((4 * O, 4 * I, 3, 3), w.dtype)
    for qi in (0, 1):
        for qj in (0, 1):
            for ky in range(3):
                pi, ry = _phi(qi, ky)
                for kx in range(3):
                    pj, rx = _phi(qj, kx)
                    wf = wf.at[
                        (qi * 2 + qj) * O:(qi * 2 + qj + 1) * O,
                        (pi * 2 + pj) * I:(pi * 2 + pj + 1) * I,
                        ry + 1, rx + 1].set(w[:, :, ky, kx])
    return wf


def fold_weight_down(w):
    """Fine 3×3 stride-2 correlation kernel [O, I, 3, 3] → folded 2×2
    kernel [O, 4I, 2, 2] consuming the (H/2+1)-sized pre-blurred folded
    grid with no padding.  Fine output row = 2i, tap ky: fine input row
    2i+ky → phase ky%2, coarse offset ky//2."""
    O, I = int(w.shape[0]), int(w.shape[1])
    wf = jnp.zeros((O, 4 * I, 2, 2), w.dtype)
    for ky in range(3):
        pi, ry = ky % 2, ky // 2
        for kx in range(3):
            pj, rx = kx % 2, kx // 2
            wf = wf.at[:, (pi * 2 + pj) * I:(pi * 2 + pj + 1) * I,
                       ry, rx].set(w[:, :, ky, kx])
    return wf


def fold_weight_up(w):
    """Already-flipped fine 3×3 transposed-conv kernel [O, I, 3, 3] (the
    ``w'`` that :func:`..ops.conv_resample._conv2d_up` correlates with at
    lhs_dilation=2, pad=2, pyt=0) → folded 2×2 kernel [4O, I, 2, 2].

    Fine output m = 2y+q taps dilated index j = m+k-2 (k ∈ 0..2), nonzero
    iff j even → q=0: k=0→coarse y-1, k=2→y; q=1: k=1→y.  With coarse
    padding (1,1) the conv output has H+1 rows representing fine rows
    0..2H+1 (the last fine row is structurally zero)."""
    O, I = int(w.shape[0]), int(w.shape[1])
    wf = jnp.zeros((4 * O, I, 2, 2), w.dtype)
    # (q, k) → R index under pad_lo=1: tap reads x[y + R - 1]
    taps = {(0, 0): 0, (0, 2): 1, (1, 1): 1}    # q=0: y-1,y ; q=1: y
    for (qi, ky), R in taps.items():
        for (qj, kx), S in taps.items():
            wf = wf.at[(qi * 2 + qj) * O:(qi * 2 + qj + 1) * O, :,
                       R, S].set(w[:, :, ky, kx])
    return wf


# ---------------------------------------------------------------------------
# folded convolutions
# ---------------------------------------------------------------------------

def conv_s1_folded(x, w, variant=None):
    """Stride-1 3×3 conv in the folded domain.

    ``x``: folded [N, 4I, h, w]; ``w``: FINE correlation kernel
    [O, I, 3, 3] (flip already applied by the caller, as in
    ``conv_resample._conv2d``).  Returns folded [N, 4O, h, w]."""
    O = int(w.shape[0])
    if variant is None:
        variant = "B" if 2 * O >= 128 else "A"
    w = w.astype(x.dtype)
    if variant == "A":
        wf = fold_weight_s1_full(w)
        return lax.conv_general_dilated(
            x, wf, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN)
    w0, w1 = fold_weight_s1_pair(w)
    y0 = lax.conv_general_dilated(
        x, w0, (1, 1), [(1, 0), (1, 1)], dimension_numbers=_DN)
    y1 = lax.conv_general_dilated(
        x, w1, (1, 1), [(0, 1), (1, 1)], dimension_numbers=_DN)
    return jnp.concatenate([y0, y1], axis=1)


def conv_down_folded(x, w, f):
    """Folded equivalent of ``conv2d_resample(x, w, f, down=2, padding=1)``
    for a 3×3 correlation kernel: pre-blur (folded shift-add) then one
    2×2 coarse conv.  ``x``: folded [N, 4I, h, w]; returns UNFOLDED
    [N, O, h, w] (the natural next-level layout)."""
    t = blur_pre_down_folded(x, f)              # [N, 4I, h+1, w+1]
    wf = fold_weight_down(w.astype(x.dtype))
    return lax.conv_general_dilated(
        t, wf, (1, 1), [(0, 0), (0, 0)], dimension_numbers=_DN)


def conv_up_folded(x, w, f, gain=4):
    """Folded equivalent of the up=2 k=3 path of ``conv2d_resample``
    (padding=1, pyt=pxt=0): one 2×2 coarse conv producing folded phases,
    then the folded post-blur.  ``x``: UNFOLDED [N, I, h, w]; ``w``: the
    already-flipped kernel ``w'`` (see :func:`fold_weight_up`); returns
    folded [N, 4O, h, w]."""
    wf = fold_weight_up(w.astype(x.dtype))
    y = lax.conv_general_dilated(
        x, wf, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN)
    return blur_post_up_folded(y, f, gain=gain)  # [N,4O,h+1,w+1] → [N,4O,h,w]


# ---------------------------------------------------------------------------
# folded 4-tap FIR blurs (shift-and-add; XLA fuses)
# ---------------------------------------------------------------------------

def _sep_taps(f):
    """Return the 4 separable 1D taps of the resample filter (``f`` as
    produced by ``setup_filter`` — 2D outer-product form [4, 4], or 1D
    [4]).  setup_filter normalizes to unit sum, so the 2D form factors
    exactly as outer(t, t) with t the unit-sum 1D taps."""
    f = np.asarray(f, np.float64)
    if f.ndim == 1:
        t = f
    else:
        assert f.shape == (4, 4), f.shape
        # rank-1 by construction (setup_filter outer product): with
        # F = outer(u, u), row sums c_i = u_i·Σu and ΣF = (Σu)², so
        # u = c / sqrt(ΣF) exactly.
        c = np.sum(f, axis=1)
        s = np.sum(f)
        t = c / np.sqrt(s) if s > 0 else c
    return [float(v) for v in t]


def _axis_shift_add(x, taps, axis, out_len, idx_map):
    """Generic folded 1D FIR along ``axis`` (2=rows, 3=cols).

    ``idx_map(q, k) -> (p, off)``: output phase q, tap k reads input
    phase p at coarse offset off.  Input/output phase blocks are the
    row-phase (axis=2) or col-phase (axis=3) component of the
    phase-major channel index.  Implemented with explicit pads+slices;
    everything is elementwise adds that XLA fuses."""
    n, c4, h, w = x.shape
    c = c4 // 4
    # view phases: [N, 2(pi), 2(pj), C, H, W]
    xv = x.reshape(n, 2, 2, c, h, w)
    in_len = x.shape[axis]
    # pad so every (off ∈ [-1, 1]) access is a static in-range slice;
    # reads past in_len are structural zeros of the fine-grid contract
    pad_hi = max(out_len + 1 - in_len, 1)
    pad = [(0, 0)] * 6
    pad[axis + 2] = (1, pad_hi)
    xp = jnp.pad(xv, pad)

    def take(p, off):
        sl = [slice(None)] * 6
        sl[axis + 2] = slice(1 + off, 1 + off + out_len)
        if axis == 2:
            sl[1] = slice(p, p + 1)
        else:
            sl[2] = slice(p, p + 1)
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
    """Folded ``upfirdn2d(x, f, padding=[2,2,2,2])`` (the pre-down blur of
    conv2d_resample's down fast path for k=3, padding=1, 4-tap f): fine
    S → S+1 per dim, folded coarse h → h+1 (last fine row of the h+1
    grid is structurally zero).  out[m] = Σ_k f'[k]·x[m+k-2] where f' is
    the flipped filter — 4-tap symmetric filters are flip-invariant, and
    `setup_filter` already normalized f."""
    taps = _sep_taps(f)[::-1]                   # flip (correlation → conv)

    def imap(q, k):
        d = q + k
        p = d % 2
        return p, (d - p) // 2 - 1

    h, w = x.shape[2], x.shape[3]
    x = _axis_shift_add(x, taps, 2, h + 1, imap)
    x = _axis_shift_add(x, taps, 3, w + 1, imap)
    return x


def blur_post_up_folded(x, f, gain=4):
    """Folded ``upfirdn2d(y, f, padding=[1,1,1,1], gain=4)`` applied to the
    folded up-conv output (coarse h+1 grid over fine 2h+1 rows, the
    (h+1)-th fine row structurally zero): out fine m = Σ_k f'[k]·y[m+k-1],
    m ∈ [0, 2h-1] → folded coarse h."""
    g = float(gain) ** 0.5
    taps = [t * g for t in _sep_taps(f)[::-1]]

    def imap(q, k):
        d = q + k - 1
        p = d % 2
        return p, (d - p) // 2

    h = x.shape[2] - 1
    w = x.shape[3] - 1
    x = _axis_shift_add(x, taps, 2, h, imap)
    x = _axis_shift_add(x, taps, 3, w, imap)
    return x


def upsample2d_folded(img, f, gain=4):
    """Folded ``upsample2d(img, f)``: unfolded [N, C, h, w] → folded
    [N, 4C, h, w] of the 2h×2w upsampled image (torgb img-pyramid skip).

    Derivation (upfirdn up=2, pad [2,1,2,1], 4-tap): out[2y+q] =
    Σ_{k: (q+k) even} f'[k]·in[y + (q+k-2)/2] → per phase two taps."""
    g = float(gain) ** 0.5
    taps = [t * g for t in _sep_taps(f)[::-1]]
    n, c, h, w = img.shape
    xp = jnp.pad(img, ((0, 0), (0, 0), (1, 1), (1, 1)))

    def phase_taps(q):
        # (tap index k, input offset) pairs with (q+k) even
        return [(k, (q + k - 2) // 2) for k in range(4) if (q + k) % 2 == 0]

    rows = {}
    for qi in (0, 1):
        for qj in (0, 1):
            acc = None
            for ky, oy in phase_taps(qi):
                for kx, ox in phase_taps(qj):
                    t = taps[ky] * taps[kx]
                    term = lax.slice(
                        xp, (0, 0, 1 + oy, 1 + ox),
                        (n, c, 1 + oy + h, 1 + ox + w)) \
                        * jnp.asarray(t, img.dtype)
                    acc = term if acc is None else acc + term
            rows[qi * 2 + qj] = acc
    return jnp.concatenate([rows[p] for p in range(4)], axis=1)


# ---------------------------------------------------------------------------
# folded 1×1 conv (fromrgb / torgb / res-link): phases are independent,
# so run them as extra batch — no padded FLOPs at all
# ---------------------------------------------------------------------------

def conv_1x1_folded(x, w):
    """1×1 conv on a folded tensor by moving phases into batch.
    ``x``: folded [N, 4I, h, w]; ``w``: [O, I, 1, 1] → folded [N, 4O, h, w]."""
    n, c4, h, w_ = x.shape
    I = c4 // 4
    xb = x.reshape(n * 4, I, h, w_)
    y = lax.conv_general_dilated(
        xb, w.astype(x.dtype), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=_DN)
    return y.reshape(n, 4 * int(w.shape[0]), h, w_)


def fold_noise(noise):
    """Fine noise [..., S, S] (optionally with leading batch/channel dims)
    → folded [..., 4, S/2, S/2] phase block matching phase-major layout."""
    sh = noise.shape
    s = sh[-1]
    x = noise.reshape(sh[:-2] + (s // 2, 2, s // 2, 2))
    nd = x.ndim
    x = jnp.moveaxis(x, (nd - 3, nd - 1), (nd - 4, nd - 3))
    return x.reshape(sh[:-2] + (4, s // 2, s // 2))
