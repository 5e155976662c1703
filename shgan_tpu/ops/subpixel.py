"""Phase-decomposed (subpixel) transposed convolution for TPU.

Exact rewrite of the ``lhs_dilation=(2, 2)`` conv in
:func:`shgan_tpu.ops.conv_resample._conv2d_up` (the reference's up>1 path,
`/root/reference/lib/model_zoo/stylegan_utils/conv2d_resample.py:122-142`)
as FOUR phase convolutions at the *coarse* grid plus one reshape-interleave.

Why it exists / why it is OFF: a stride-2 transposed conv has only
``ceil(k/2)²`` kernel taps landing on real input samples per output pixel
(the rest hit inserted zeros), so nominal-FLOPs accounting (k²·H_out²)
overstates useful work 4× — the round-4 hypothesis was that XLA's
input-dilated conv pays that factor.  **Measured: it does not.** The
lhs_dilation conv reaches 115–204 TF/s *nominal* on the g512 up-convs
(above the 197 TF/s v5e peak ⇒ XLA already skips the zero taps
internally), and this decomposition LOSES at every model shape
(0.52–0.98×, tools/bench_subpixel.py, docs/perf_ab.json "subpixel
up-conv") — the interleave transpose lands in a 4×-padded layout
(``bf16[...,2,...,2]`` tiles) and OOMs outright at 2048² outputs.  Kept
as an opt-in oracle + a recorded dead end; the model default stays on
the dilated conv.

The decomposition, for ``up=2``, kernel ``k=3``, correlation with symmetric
padding ``lo = hi = p`` (what ``_conv2d_up`` emits):

  dilated input  X[2m] = x[m]  (size 2H-1),   y[o] = Σ_t w[t]·X[o + t - p]
  parity:        t ≡ (p + o) mod 2, so with o = 2u + a, r_a = (p + a) mod 2:
  y[2u+a]      = Σ_j w[r_a + 2j] · x[u + s_a + j],   s_a = (a + r_a - p)//2

Every phase reads x at offsets ``u + S + j`` for the common ``S = min_a
s_a`` once each sub-kernel is placed at the right position inside a padded
``⌈k/2⌉²`` grid, so all four phases run as ONE conv with ``4·C_out`` output
channels over the coarse grid; the interleave is a transpose+reshape.
Useful-tap count per 2×2 output cell is k²=9 of the 16 padded MACs, and
the padded MACs run on a 4×-wider output-channel GEMM (full MXU lanes at
the 32-channel 1024² level) over a 4×-smaller spatial grid.

Everything here is standard lax convs + reshapes: differentiable
(``jax.grad`` composes) and partitionable under pjit, unlike the Pallas
paths — so it may be enabled for training and multi-chip too if measured
ahead. Routing mirrors ops/conv1024.py: ``set_subpixel_impl('phase')``
switches eligible up-convs in ``conv_resample._conv2d_up``; the env var
``SHGAN_SUBPIXEL`` overrides.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

_IMPL = "xla"


def set_subpixel_impl(impl):
    """'phase' routes eligible up=2 k=3 convs through
    :func:`conv2d_up_phase`; 'xla' restores the lhs_dilation conv. The
    env override ``SHGAN_SUBPIXEL`` wins (measured-gate escape hatch)."""
    global _IMPL
    assert impl in ("phase", "xla"), impl
    _IMPL = os.environ.get("SHGAN_SUBPIXEL", impl)


def subpixel_eligible(w_shape, up, padding, groups):
    """True iff the phase decomposition covers this transposed conv AND it
    is switched on: up=2, square odd kernel (3×3 in every SH-GAN/StyleGAN2
    up layer), no groups, and torch-side pads in {0, 1, 2} — the range
    :func:`conv2d_up_phase`'s placement algebra is derived for (it assumes
    the lax-side pad ``k-1-pyt`` is non-negative); out-of-contract pads
    fall back to the XLA dilated conv instead of mis-lowering."""
    if _IMPL != "phase":
        return False
    oc, ic, kh, kw = w_shape
    return (up == 2 and groups == 1 and kh == kw == 3
            and 0 <= padding[0] <= 2 and 0 <= padding[1] <= 2)


def conv2d_up_phase(x, w, padding):
    """Exact equal of ``lax.conv_general_dilated(x, w, (1,1),
    [(p,p),(p,p)], lhs_dilation=(2,2))`` with ``p = k-1-padding[i]`` — the
    op `_conv2d_up` emits — for 3×3 kernels.

    Args:
        x: ``[N, C_in, H, W]``.
        w: ``[C_out, C_in, 3, 3]`` (already flip-resolved by the caller).
        padding: ``(pyt, pxt)`` torch-side pads, each in ``{0, 1, 2}``.

    Returns:
        ``[N, C_out, Ho, Wo]`` with ``Ho = 2H - 1 + 2(2-pyt) - 2`` exactly
        as the dilated conv produces.
    """
    n, cin, h, wd = x.shape
    cout = w.shape[0]
    k = 3
    pyt, pxt = padding
    py, px = k - 1 - pyt, k - 1 - pxt  # lax-side symmetric pads
    oh, ow = 2 * h - 1 + 2 * py - (k - 1), 2 * wd - 1 + 2 * px - (k - 1)

    # Per-phase sub-kernels placed in a common 2×2 grid. Phase a reads
    # taps t ≡ r_a (mod 2); tap t = r_a + 2j contributes coefficient
    # w[t] at input offset u + s_a + j. Aligning on the common base
    # S = min_a s_a, tap j of phase a sits at grid position
    # g = j + (s_a - S), i.e. K_a[g] = w[r_a + 2(g - s_a + S)].
    def phase_meta(a, p):
        r = (p + a) % 2
        s = (a + r - p) // 2
        return r, s

    metas_y = [phase_meta(a, py) for a in (0, 1)]
    metas_x = [phase_meta(b, px) for b in (0, 1)]
    sy = min(s for _, s in metas_y)
    sx = min(s for _, s in metas_x)

    # Build the [4·C_out, C_in, 2, 2] stacked kernel (phase-major: a, b).
    blocks = []
    for ry, s_a in metas_y:
        for rx, s_b in metas_x:
            kb = jnp.zeros((cout, cin, 2, 2), w.dtype)
            for gy in range(2):
                ty = ry + 2 * (gy - (s_a - sy))
                if not 0 <= ty < k:
                    continue
                for gx in range(2):
                    tx = rx + 2 * (gx - (s_b - sx))
                    if not 0 <= tx < k:
                        continue
                    kb = kb.at[:, :, gy, gx].set(w[:, :, ty, tx])
            blocks.append(kb)
    wbig = jnp.concatenate(blocks, axis=0)

    # One conv over the coarse grid. Phase a covers outputs o = 2u + a,
    # u = 0 .. ceil((oh - a)/2) - 1; it reads x[u + s_a + g - (s_a - sy)]
    # = x[u + sy + g], so pad lo = -sy and hi enough for the largest u.
    uh = (oh + 1) // 2  # coarse rows needed (phase 0 count ≥ phase 1's)
    uw = (ow + 1) // 2
    lo_y, lo_x = -sy, -sx
    hi_y = (uh - 1) + sy + 1 - (h - 1)  # last tap index minus last x row
    hi_x = (uw - 1) + sx + 1 - (wd - 1)
    yp = lax.conv_general_dilated(
        x, wbig.astype(x.dtype), (1, 1),
        [(lo_y, max(hi_y, 0)), (lo_x, max(hi_x, 0))],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    yp = yp[:, :, :uh, :uw]

    # Interleave: [N, (a,b,c), U, V] → [N, C, 2U, 2V] → crop to (oh, ow).
    yp = yp.reshape(n, 2, 2, cout, uh, uw)
    yp = jnp.transpose(yp, (0, 3, 4, 1, 5, 2))  # N, C, U, a, V, b
    y = yp.reshape(n, cout, 2 * uh, 2 * uw)
    return y[:, :, :oh, :ow]
