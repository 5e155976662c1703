"""Pallas TPU kernel for the depthwise FIR pass of upfirdn2d (opt-in).

A depthwise 4×4 filter does no MXU work; this kernel streams each
(n, channel-block) through VMEM once and applies the filter as two
separable shifted-multiply-add passes on the VPU with fp32 accumulation.

OUTCOME (v5e, 512² generator, batch 120): a 2.3× end-to-end LOSS vs the
XLA depthwise conv (147 vs 344 img/s; isolated 220 vs 690 GB/s) — XLA's
FIR emitter is already near HBM speed-of-light and fuses the producing
``lax.pad``, which the custom-call boundary here prevents.  The default
``auto`` impl therefore routes NOTHING; the kernel remains available via
``SHGAN_FIR=pallas`` (or ``set_fir_impl``) as an fp32-exact oracle — the
XLA path truncates through the bf16 MXU (~6e-3 abs error at unit scale),
this kernel holds ~1e-7.

Scope: *valid* stride-1 correlation with a separable T×T filter over an
already-padded input (upfirdn2d keeps its ``lax.pad`` — including the
interior dilation of the up>1 cases — in XLA where it fuses into the
producing convolution).  Down-sampling cases stay on the XLA path.

The op is linear, so the custom VJP computes the cotangent with the
existing XLA depthwise conv (full correlation with the flipped filter) —
exactly the adjoint the autodiff of the XLA path would produce.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

_IMPL = os.environ.get("SHGAN_FIR", "auto")  # auto | xla | pallas | interpret


def set_fir_impl(impl):
    """'auto' (pallas on TPU when profitable), 'xla', 'pallas', or
    'interpret' (pallas interpreter — CPU tests)."""
    global _IMPL
    assert impl in ("auto", "xla", "pallas", "interpret"), impl
    _IMPL = impl


def get_fir_impl():
    return _IMPL


def separable_factor(f2d, tol=1e-6):
    """Factor a 2D filter into (fcol, frow) with ``outer(fcol, frow) == f``
    (rank-1 check via SVD); returns None if not separable."""
    f = np.asarray(f2d, np.float64)
    if f.ndim != 2:
        return None
    u, s, vt = np.linalg.svd(f)
    if s[0] == 0 or (len(s) > 1 and s[1] > tol * s[0]):
        return None
    fcol = u[:, 0] * np.sqrt(s[0])
    frow = vt[0] * np.sqrt(s[0])
    # canonical sign: make the largest |tap| of frow positive
    if frow[np.argmax(np.abs(frow))] < 0:
        frow, fcol = -frow, -fcol
    return (tuple(float(v) for v in fcol), tuple(float(v) for v in frow))


def _pad_hw(h, w, itemsize):
    """VMEM footprint of an [h, w] plane after Mosaic tiling: lanes round
    up to 128, sublanes to the dtype's tile height (32 / itemsize)."""
    sub = 32 // itemsize
    return -(-h // sub) * sub * (-(-w // 128) * 128)


def _pick_cb(C, hp, wp, ho, wo, itemsize, budget=6 * 2**20):
    """Largest channel block (divisor of C) whose VMEM working set fits the
    budget: double-buffered input + output blocks (Mosaic pipelines the
    grid) plus the fp32 row-pass intermediate, all at *padded* tile sizes.
    Capped at 64: the v5e Mosaic compiler rejects 128-channel blocks of
    small planes (measured: cb=128 at [512,67,67] fails, cb<=64 compiles)."""
    per = (2 * _pad_hw(hp, wp, itemsize) * itemsize
           + _pad_hw(ho, wp, 4) * 4
           + 2 * _pad_hw(ho, wo, itemsize) * itemsize)
    cb = max(1, min(C, 64, budget // max(per, 1)))
    while C % cb:
        cb -= 1
    return cb


def _kernel(x_ref, o_ref, *, fcol, frow, ho, wo):
    x = x_ref[0].astype(jnp.float32)          # [cb, Hp, Wp]
    acc = x[:, 0:ho, :] * fcol[0]             # column pass (sublane shifts)
    for a in range(1, len(fcol)):
        acc = acc + x[:, a:a + ho, :] * fcol[a]
    out = acc[:, :, 0:wo] * frow[0]           # row pass (lane shifts)
    for b in range(1, len(frow)):
        out = out + acc[:, :, b:b + wo] * frow[b]
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas_fir(x, fcol, frow, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c, hp, wp = x.shape
    th, tw = len(fcol), len(frow)
    ho, wo = hp - th + 1, wp - tw + 1
    cb = _pick_cb(c, hp, wp, ho, wo, x.dtype.itemsize)
    kern = functools.partial(_kernel, fcol=fcol, frow=frow, ho=ho, wo=wo)
    flops = 2 * n * c * (ho * wp * th + ho * wo * tw)
    bytes_accessed = (n * c * hp * wp + n * c * ho * wo) * x.dtype.itemsize
    return pl.pallas_call(
        kern,
        grid=(n, c // cb),
        in_specs=[pl.BlockSpec((1, cb, hp, wp), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, cb, ho, wo), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, ho, wo), x.dtype),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(x)


def _xla_fir(x, fcol, frow):
    """XLA depthwise-conv fallback computing the identical valid
    correlation (used for the VJP and the non-TPU path)."""
    from .upfirdn2d import _depthwise_fir
    f2d = jnp.asarray(np.outer(fcol, frow), jnp.float32)
    return _depthwise_fir(x, f2d, 1, 1)


@functools.lru_cache(maxsize=None)
def _make_op(fcol, frow, impl):
    th, tw = len(fcol), len(frow)

    def primal(x):
        if impl == "xla":
            return _xla_fir(x, fcol, frow)
        return _pallas_fir(x, fcol, frow, interpret=(impl == "interpret"))

    @jax.custom_vjp
    def op(x):
        return primal(x)

    def fwd(x):
        return primal(x), None

    def bwd(_, g):
        # adjoint of valid correlation = full correlation with the flipped
        # filter: pad the cotangent by taps-1 and run the flipped kernel
        gp = jax.lax.pad(g, jnp.zeros((), g.dtype),
                         [(0, 0, 0), (0, 0, 0),
                          (th - 1, th - 1, 0), (tw - 1, tw - 1, 0)])
        return (_xla_fir(gp, fcol[::-1], frow[::-1]),)

    op.defvjp(fwd, bwd)
    return op


def fir_separable_valid(x, fcol, frow):
    """Valid stride-1 depthwise correlation of NCHW ``x`` with the
    separable filter ``outer(fcol, frow)`` (taps as static floats)."""
    return _make_op(tuple(fcol), tuple(frow), _IMPL)(x)


def fir_pallas_eligible(x_shape, dtype, fcol, frow):
    """Should upfirdn2d route this stride-1 FIR through the kernel?"""
    if _IMPL == "xla":
        return False
    if _IMPL in ("pallas", "interpret"):
        return True
    # auto = XLA.  Measured on v5e (512² generator, batch 120): routing the
    # stride-1 FIRs through this kernel is a 2.3× end-to-end LOSS (147 vs
    # 344 img/s) — XLA's depthwise conv streams at ~690 GB/s vs ~220 GB/s
    # for this kernel, and the custom-call boundary stops the lax.pad from
    # fusing into the producer.  The kernel stays as an opt-in
    # (SHGAN_FIR=pallas) fp32-exact reference: the XLA path truncates
    # through the bf16 MXU (~6e-3 abs error at unit scale), this kernel
    # accumulates in fp32 on the VPU (~1e-7).
    return False
