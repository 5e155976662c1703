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
  4-tap FIR blurs    → COMPOSED into the up/down conv kernels (the
                       folded shift-and-add formulation measured 3× the
                       direct depthwise cost — tools/bench_folded2.py —
                       so the blur taps ride the MXU instead); the
                       3-channel img pyramid stays unfolded

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


def _pairs(s):
    """(k, l) with k ∈ [0,4) (filter tap), l ∈ [0,3) (conv tap), k+l = s."""
    return [(k, s - k) for k in range(4) if 0 <= s - k <= 2]


def _prep_f2(f, gain):
    """2D FIR constant as applied by upfirdn2d: ×gain^(ndim/2)... both
    axes folded into one 2D array, flipped (convolution semantics)."""
    f = np.asarray(f, np.float64)
    if f.ndim == 1:
        f = np.outer(f, f)
    f = f * float(gain)
    return f[::-1, ::-1]


def fold_weight_up_composed(w, f, gain=4):
    """Compose the post-up FIR INTO the folded up-conv kernel.

    The direct up path (conv_resample.py up=2, k=3, padding=1) is
    ``upfirdn(f, pad[1,1], gain=4) ∘ conv(w', lhs_dilation=2, pad=2)``.
    Per axis: out[m] = Σ_{k,l} f2[k]·w'[l]·x[(m+k+l-3)/2] with parity
    (q+k+l) odd ⇔ tap offset r = (q+k+l-3)/2 ∈ {-1,0,1} — i.e. one
    DENSE 3×3 coarse conv [4O, I, 3, 3], padding (1,1), output exactly
    [N, 4O, H, W] folded.  No odd-size intermediate, no separate blur
    pass (the folded shift-add blur measured 3× the direct depthwise —
    tools/bench_folded2.py; this trades it for MXU FLOPs).

    ``w``: the already-flipped kernel ``w'`` (the kernel
    ``conv_resample._conv2d_up`` correlates with at lhs_dilation=2).
    """
    O, I = int(w.shape[0]), int(w.shape[1])
    f2 = _prep_f2(f, gain)
    wf = jnp.zeros((4 * O, I, 3, 3), w.dtype)
    for qi in (0, 1):
        for qj in (0, 1):
            for ry in (-1, 0, 1):
                for rx in (-1, 0, 1):
                    acc = None
                    for ky, ly in _pairs(2 * ry + 3 - qi):
                        for kx, lx in _pairs(2 * rx + 3 - qj):
                            term = w[:, :, ly, lx] * jnp.asarray(
                                f2[ky, kx], w.dtype)
                            acc = term if acc is None else acc + term
                    if acc is not None:
                        wf = wf.at[(qi * 2 + qj) * O:(qi * 2 + qj + 1) * O,
                                   :, ry + 1, rx + 1].set(acc)
    return wf


def fold_weight_down_composed(w, f):
    """Compose the pre-down FIR INTO the folded down-conv kernel.

    Direct path: ``conv(w, stride=2) ∘ upfirdn(f, pad[2,2])``.  Per axis:
    y[i] = Σ_{k,l} f2[k]·w[l]·x[2i+k+l-2]; fine index 2(i+r)+p with
    s = k+l = 2r+2+p — one 3×3 coarse conv [O, 4I, 3, 3], padding (1,1),
    folded input [N, 4I, H, W] → unfolded [N, O, H, W]."""
    O, I = int(w.shape[0]), int(w.shape[1])
    f2 = _prep_f2(f, 1.0)
    wf = jnp.zeros((O, 4 * I, 3, 3), w.dtype)
    for pi in (0, 1):
        for pj in (0, 1):
            for ry in (-1, 0, 1):
                for rx in (-1, 0, 1):
                    acc = None
                    for ky, ly in _pairs(2 * ry + 2 + pi):
                        for kx, lx in _pairs(2 * rx + 2 + pj):
                            term = w[:, :, ly, lx] * jnp.asarray(
                                f2[ky, kx], w.dtype)
                            acc = term if acc is None else acc + term
                    if acc is not None:
                        wf = wf.at[:, (pi * 2 + pj) * I:(pi * 2 + pj + 1) * I,
                                   ry + 1, rx + 1].set(acc)
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
    for a 3×3 correlation kernel: the pre-down FIR is composed INTO one
    3×3 coarse conv (:func:`fold_weight_down_composed`).  ``x``: folded
    [N, 4I, h, w]; returns UNFOLDED [N, O, h, w] (the natural next-level
    layout)."""
    wf = fold_weight_down_composed(w.astype(x.dtype), f)
    return lax.conv_general_dilated(
        x, wf, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN)


def conv_up_folded(x, w, f, gain=4):
    """Folded equivalent of the up=2 k=3 path of ``conv2d_resample``
    (padding=1, pyt=pxt=0): the post-up FIR is composed INTO one 3×3
    coarse conv (:func:`fold_weight_up_composed`).  ``x``: UNFOLDED
    [N, I, h, w]; ``w``: the already-flipped kernel ``w'``; returns
    folded [N, 4O, h, w]."""
    wf = fold_weight_up_composed(w.astype(x.dtype), f, gain=gain)
    return lax.conv_general_dilated(
        x, wf, (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN)


# ---------------------------------------------------------------------------
# folded 1×1 conv (fromrgb / torgb / res-link): phases are independent,
# so the folded operator is block-diagonal in the phase-major layout
# ---------------------------------------------------------------------------

def conv_1x1_folded(x, w):
    """1×1 conv on a folded tensor as ONE block-diagonal dense 1×1 conv:
    ``wf[p*O+o, p*I+i] = w[o, i]``.
    ``x``: folded [N, 4I, h, w]; ``w``: [O, I, 1, 1] → folded [N, 4O, h, w].

    The first formulation moved phases into batch (reshape [N,4I,h,w] →
    [4N,I,h,w]) to avoid the 4× nominal-FLOP inflation of the zero blocks —
    but each such reshape materializes full-tensor layout copies between
    the conv layout {1,0,3,2} and the row-major reshape layout: xprof
    (2026-08-19, folded 1024² bs=16) attributes ~30 ms/step (17%) to pure
    ``copy`` ops around these reshapes, while the padded MACs they avoid
    cost well under 1 ms.  Dense block-diagonal stays in the conv layout
    end to end and lets XLA fuse the surrounding bias/act/noise ops."""
    O, I = int(w.shape[0]), int(w.shape[1])
    wf = jnp.einsum("pq,oihw->poqihw", jnp.eye(4, dtype=x.dtype),
                    w.astype(x.dtype)).reshape(4 * O, 4 * I, 1, 1)
    return lax.conv_general_dilated(
        x, wf, (1, 1), [(0, 0), (0, 0)], dimension_numbers=_DN)


def fold_noise(noise):
    """Fine noise [..., S, S] (optionally with leading batch/channel dims)
    → folded [..., 4, S/2, S/2] phase block matching phase-major layout."""
    sh = noise.shape
    s = sh[-1]
    x = noise.reshape(sh[:-2] + (s // 2, 2, s // 2, 2))
    nd = x.ndim
    x = jnp.moveaxis(x, (nd - 3, nd - 1), (nd - 4, nd - 3))
    return x.reshape(sh[:-2] + (4, s // 2, s // 2))
