"""Fused pad → zero-insert upsample → 2D FIR filter → decimate, for TPU.

This is the TPU-native equivalent of the reference's CUDA upfirdn2d plugin
(`/root/reference/lib/model_zoo/stylegan_utils/upfirdn2d.cu`, dispatched from
`upfirdn2d.py:198`).  The operation contract (documented at
`upfirdn2d.py:199-233`) is:

  1. upsample by inserting ``up-1`` zeros after every pixel,
  2. apply signed padding (negative pad = crop) w.r.t. the upsampled image,
  3. convolve with a small FIR filter ``f`` (flip_filter=False means true
     convolution, i.e. the filter is flipped relative to correlation),
  4. keep every ``down``-th pixel.

On TPU we express steps 1+2 as a single ``lax.pad`` with interior padding
(XLA fuses it with the convolution), step 3 as a depthwise
``lax.conv_general_dilated`` on the VPU/MXU, and step 4 as window strides
folded directly into that same convolution — so the whole op compiles to ONE
XLA convolution, which is what the hand-written CUDA kernel was for.

Gradients come for free from JAX autodiff (arbitrary order), replacing the
hand-written backward at `upfirdn2d.py:174-192`.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# ---------------------------------------------------------------------------
# argument parsing helpers (same contract as reference upfirdn2d.py:33-64)
# ---------------------------------------------------------------------------

def _parse_scaling(scaling):
    if isinstance(scaling, (int, np.integer)):
        scaling = [int(scaling)] * 2
    sx, sy = (int(s) for s in scaling)
    assert sx >= 1 and sy >= 1
    return sx, sy


def _parse_padding(padding):
    if isinstance(padding, (int, np.integer)):
        padding = [int(padding)] * 2
    padding = [int(p) for p in padding]
    if len(padding) == 2:
        padx, pady = padding
        padding = [padx, padx, pady, pady]
    padx0, padx1, pady0, pady1 = padding
    return padx0, padx1, pady0, pady1


def _get_filter_size(f):
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh


# ---------------------------------------------------------------------------
# setup_filter — filter preparation (reference upfirdn2d.py:66-92)
# ---------------------------------------------------------------------------

def setup_filter(f, normalize=True, flip_filter=False, gain=1, separable=None):
    """Prepare a FIR filter constant for use with :func:`upfirdn2d`.

    Returns a float32 ``numpy`` array (a trace-time constant, baked into the
    jitted graph): 1D ``[taps]`` if separable, else 2D ``[fh, fw]``.
    Matches the semantics of the reference ``setup_filter``
    (`upfirdn2d.py:66-92`): normalize to unit sum, optional flip, then scale
    by ``gain ** (ndim / 2)``.
    """
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (0, 1, 2)
    assert f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]

    if separable is None:
        separable = (f.ndim == 1 and f.size >= 8)
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)

    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[tuple(slice(None, None, -1) for _ in range(f.ndim))]
    f = f * (gain ** (f.ndim / 2))
    return np.ascontiguousarray(f, dtype=np.float32)


# ---------------------------------------------------------------------------
# core op
# ---------------------------------------------------------------------------

def _depthwise_fir(x, f, downx, downy):
    """Depthwise-convolve NCHW ``x`` with the (already flipped/scaled) 2D
    filter ``f``, decimating by (downy, downx) via conv window strides."""
    num_channels = x.shape[1]
    kernel = jnp.broadcast_to(
        f.astype(x.dtype)[None, None], (num_channels, 1, f.shape[0], f.shape[1])
    )
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(downy, downx),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=num_channels,
    )


@functools.lru_cache(maxsize=None)
def _fir_matrix(n_in, taps, up, down, pad0, pad1):
    """Banded [n_out, n_in] matrix equal to the 1D upfirdn applied along one
    axis: zero-insert by ``up``, signed-pad (``pad0``, ``pad1 + up - 1``),
    correlate with ``taps`` (already gain-scaled and flipped — exactly the
    per-axis filter :func:`_depthwise_fir` would use), decimate by ``down``.

    Built in float64 numpy at trace time (cached per shape/filter config) so
    the matmul formulation below is exact vs the depthwise-conv formulation
    to float rounding."""
    t = len(taps)
    n_up = n_in * up - (up - 1)          # interior zeros only BETWEEN samples
    lo, hi = pad0, pad1 + up - 1
    n_pad = lo + n_up + hi
    m = np.zeros((max(n_pad, 0), n_in), np.float64)
    for i in range(n_in):
        r = lo + i * up
        if 0 <= r < n_pad:               # negative pads crop (lax.pad neg)
            m[r, i] = 1.0
    n_out = (n_pad - t) // down + 1
    out = np.zeros((n_out, n_in), np.float64)
    for k, fk in enumerate(taps):
        out += fk * m[k:k + (n_out - 1) * down + 1:down]
    return np.ascontiguousarray(out, np.float32)


# Max channel count routed through the matmul-FIR formulation.  An NCHW
# tensor with C channels occupies C/128 of the vector lanes in the tiled
# layouts XLA picks for the depthwise-conv formulation — the 3-channel img
# pyramid upsamples measured 8-12 GB/s effective HBM bandwidth (xprof,
# 2026-08-19: 26.5 ms of a 336 ms 512^2 forward, 26.3/188 ms at 1024^2).
# Two dense banded matmuls over the H/W axes instead put the work on the
# MXU with the 128-lane dimension on W: nominal FLOPs inflate ~65x but the
# op is ~1000x under the compute roof, so it collapses into the noise.
_FIR_MATMUL_MAX_C = 8

# ...and min spatial extent: isolated v5e A/B (tools/bench_fir3.py,
# 2026-08-19) — up 256->512 1.94x, dn 512->256 2.15x, up 512->1024 1.47x,
# but up 128->256 is 0.89x (the op is too small to amortize the ~65x
# nominal-FLOP inflation).  Route only when some spatial extent (before or
# after resampling) reaches this.
_FIR_MATMUL_MIN_HW = 512


def _fir_matmul(x, fy, fx, up, down, pads):
    """Separable upfirdn as two banded matmuls (H then W axis)."""
    upx, upy = up
    downx, downy = down
    padx0, padx1, pady0, pady1 = pads
    mh = jnp.asarray(_fir_matrix(x.shape[2], tuple(float(v) for v in fy),
                                 upy, downy, pady0, pady1), x.dtype)
    mw = jnp.asarray(_fir_matrix(x.shape[3], tuple(float(v) for v in fx),
                                 upx, downx, padx0, padx1), x.dtype)
    x = jnp.einsum("oh,nchw->ncow", mh, x)
    return jnp.einsum("pw,ncow->ncop", mw, x)


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """Pad, upsample, FIR-filter, and downsample a batch of NCHW images.

    Args:
        x: ``[N, C, H, W]`` array.
        f: float FIR filter, ``[fh, fw]`` (non-separable), ``[taps]``
           (separable), or None (identity). Constant (numpy or jnp).
        up / down: int or (x, y) int pair.
        padding: int, ``[x, y]`` or ``[x0, x1, y0, y1]`` — signed, w.r.t. the
           upsampled image.
        flip_filter: False = convolution, True = correlation.
        gain: overall scaling factor.

    Returns ``[N, C, outH, outW]`` with
    ``outH = (H*upy + pady0 + pady1 - fh) // downy + 1`` (same arithmetic as
    the reference host wrapper `upfirdn2d.cpp:38-42`).
    """
    assert x.ndim == 4
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    if f is None:
        f = np.ones((1, 1), dtype=np.float32)
    # Filter taps are trace-time constants in every real model.  Keep a host
    # copy: under jit, jnp ops stage even constants into tracers, so the
    # kernel-routing decision below must inspect the taps *before* they
    # enter the trace.  A genuinely traced filter disables the kernel route.
    try:
        f_host = np.asarray(f, dtype=np.float32)
    except Exception:
        f_host = None
    f = jnp.asarray(f, dtype=jnp.float32)
    assert f.ndim in (1, 2)

    # Low-channel route: C <= _FIR_MATMUL_MAX_C tensors (the 3-channel img
    # pyramid) run the whole upfirdn as two banded matmuls on the MXU —
    # the depthwise-conv formulation leaves 125/128 lanes idle there.
    from .fir_pallas import get_fir_impl, separable_factor
    big = max(int(x.shape[2]) * max(upy, 1), int(x.shape[3]) * max(upx, 1),
              int(x.shape[2]), int(x.shape[3]))
    if (f_host is not None and int(x.shape[1]) <= _FIR_MATMUL_MAX_C
            and big >= _FIR_MATMUL_MIN_HW
            and os.environ.get("SHGAN_FIR_MATMUL", "1") == "1"
            and get_fir_impl() == "auto"):  # explicit kernel opt-in wins
        f_np = f_host * (gain ** (f_host.ndim / 2))
        if not flip_filter:
            f_np = f_np[tuple(slice(None, None, -1)
                              for _ in range(f_np.ndim))]
        if f_np.ndim == 1:
            fac = (f_np, f_np)   # carries sqrt(gain) per axis
        else:
            fac = separable_factor(f_np)
        if fac is not None:
            return _fir_matmul(x, fac[0], fac[1], (upx, upy),
                               (downx, downy), (padx0, padx1, pady0, pady1))

    # Steps 1+2 fused: interior padding inserts up-1 zeros BETWEEN samples;
    # the reference inserts them AFTER each sample (upfirdn2d.py:114-116), so
    # fold the missing up-1 trailing zeros into the high edge pad.  Negative
    # edge padding in lax.pad performs the crop of upfirdn2d.py:119-120.
    x = lax.pad(
        x,
        jnp.zeros((), x.dtype),
        [
            (0, 0, 0),
            (0, 0, 0),
            (pady0, pady1 + upy - 1, upy - 1),
            (padx0, padx1 + upx - 1, upx - 1),
        ],
    )

    # Step 3 setup: scale by gain, flip unless correlation requested
    # (upfirdn2d.py:123-126).  The depthwise conv below performs correlation,
    # so we flip for the default convolution semantics.
    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = f[tuple(slice(None, None, -1) for _ in range(f.ndim))]

    # Opt-in: stride-1 separable FIR → Pallas VPU kernel (fir_pallas.py).
    # Default 'auto' routes nothing — the XLA depthwise conv measures
    # FASTER end-to-end (see fir_pallas.py docstring); the kernel serves
    # as an fp32-exact oracle via SHGAN_FIR=pallas.
    if downx == 1 and downy == 1 and f_host is not None:
        from . import fir_pallas
        # consult the impl switch BEFORE factoring: default 'auto' routes
        # nothing, so skip the trace-time SVD + duplicated gain/flip work
        # unless the kernel is actually opted in
        if fir_pallas.get_fir_impl() in ("pallas", "interpret"):
            f_np = f_host * (gain ** (f_host.ndim / 2))
            if not flip_filter:
                f_np = f_np[tuple(slice(None, None, -1)
                                  for _ in range(f_np.ndim))]
            if f_np.ndim == 1:
                # 1D = separable by construction; f carries sqrt(gain), so
                # using it on both axes applies the full gain
                fac = (tuple(float(v) for v in f_np),
                       tuple(float(v) for v in f_np))
            else:
                fac = fir_pallas.separable_factor(f_np)
            if fac is not None and fir_pallas.fir_pallas_eligible(
                    x.shape, x.dtype, fac[0], fac[1]):
                return fir_pallas.fir_separable_valid(x, fac[0], fac[1])

    if f.ndim == 2:
        x = _depthwise_fir(x, f, downx, downy)
    else:
        # Separable: two 1D depthwise passes (W then H).  ``f`` above was
        # scaled by gain**(1/2) once; using it in both passes applies the
        # full gain, matching the sqrt(gain)-per-pass split of the reference
        # (upfirdn2d.py:167-168).
        x = _depthwise_fir(x, f[None, :], downx, 1)
        x = _depthwise_fir(x, f[:, None], 1, downy)
    return x


# ---------------------------------------------------------------------------
# convenience wrappers (padding algebra per reference upfirdn2d.py:245-351)
# ---------------------------------------------------------------------------

def filter2d(x, f, padding=0, flip_filter=False, gain=1):
    """FIR-filter with output shape matching input (reference upfirdn2d.py:245)."""
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + fw // 2,
        padx1 + (fw - 1) // 2,
        pady0 + fh // 2,
        pady1 + (fh - 1) // 2,
    ]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1):
    """Upsample by ``up`` with FIR smoothing (reference upfirdn2d.py:279)."""
    upx, upy = _parse_scaling(up)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1):
    """Downsample by ``down`` with FIR anti-aliasing (reference upfirdn2d.py:316)."""
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
