"""Pallas direct 3×3 conv for the MXU-starved low-channel 1024² level.

Why: the full-size channel plan gives the top pyramid level 32 channels
(`/root/reference/configs/model/comodgan.yaml` ch plan at 1024², see
`models/synthesis.py`), and XLA's conv emitter reaches only ~8 TF/s on
that shape on v5e — ~4% of peak (tools/bench_1024.py).

Measured A/B series (docs/perf_ab.json "1024² conv formulations"):
XLA NCHW 18.9 ms, XLA NHWC 18.9 ms, this kernel 16.5 ms (1.15×), a
9-shifted-inputs variant 26.5 ms, an overlapping-W-panels variant
18.8 ms.  Every exact halo-baked formulation converges to the same
~280 GB/s effective-bandwidth wall: blocked BlockSpecs cannot express
overlapping windows, so the dy halo must be baked into three row-shifted
copies of the input (3× read traffic + prep copies), and the single-read
design that would beat it needs a manual 4D HBM→VMEM window DMA — which
the remote Mosaic compile helper rejects (HTTP 500; 2D DMA compiles).
The residual structural ceiling is the C_out=32 output: 25% MXU lane
fill for any exact 32-channel contraction.

Kernel shape:
  * three dy-shifted inputs, ordinary blocked BlockSpecs (the grid
    pipeline double-buffers them),
  * NCHW with W on lanes; dx taps are lane-offset slices concatenated
    along the (untiled) channel axis → one [3C, BH, W] operand per dy,
  * rank-3 ``dot_general`` [C_out, 3C] × [3C, BH, W] per dy with fp32
    accumulation — K=96 contraction, W=1024 output lanes.  BH=8 is the
    largest row block that fits VMEM at W=1024 (BH=16 overflows; the
    helper masks VMEM overflow as an opaque HTTP 500).

Routing (r4): ``set_conv1024_impl("pallas")`` switches the
stride-1/groups-1/pad-1 3×3 convs with C≤32 at H=W≥1024 in
``ops.conv_resample._conv2d`` onto this kernel.  **Opt-in ONLY**
(``SHGAN_CONV1024=pallas``): the 1.18× isolated-kernel win does NOT
survive the full 1024² model — a full-model A/B (r4, bench.py
BENCH_RES=1024) measured 82.0/83.4 img/s on the pure-XLA path vs
60.8/61.5 img/s with this kernel routed (0.73×).  The ``pallas_call``
is an optimization barrier: XLA can no longer fuse the surrounding
bias/act/FIR elementwise work into the conv and inserts layout
conversions around the custom call, costing far more than the 2.4 ms/
conv the kernel saves (docs/perf_ab.json record 16).  Training keeps
the XLA conv regardless (``pallas_call`` has no VJP here and does not
auto-partition under pjit).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 8  # output rows per grid step (16 overflows VMEM at W=1024)

_IMPL = "xla"


def set_conv1024_impl(impl):
    """'pallas' routes eligible low-channel ≥1024² convs through
    :func:`conv3x3_lowch`; 'xla' restores the default.  The env override
    ``SHGAN_CONV1024`` wins (measured-gate escape hatch)."""
    global _IMPL
    assert impl in ("pallas", "xla"), impl
    _IMPL = os.environ.get("SHGAN_CONV1024", impl)


MIN_RES = 1024  # below this the XLA conv wins (docs/perf_ab.json)


def conv1024_eligible(x_shape, w_shape, stride, groups, padding):
    """True iff the Pallas kernel covers this conv AND it is switched on:
    the measured-win shape class (3×3, stride 1, pad 1, C_in=C_out≤32,
    H=W≥MIN_RES, H divisible by the row block)."""
    if _IMPL != "pallas":
        return False
    n, c, h, wd = x_shape
    oc, cg, kh, kw = w_shape
    return (stride == 1 and groups == 1 and (kh, kw) == (3, 3)
            and padding == (1, 1) and c <= 32 and oc <= 32
            and h == wd and h >= MIN_RES and h % BH == 0)


def _kernel(x0_ref, x1_ref, x2_ref, w_ref, o_ref, acc):
    """One (n, i) tile: out[:, rows] = Σ_dy W_dy @ concat_dx(x_dy)."""
    w = o_ref.shape[-1]
    for dy, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        a = jnp.concatenate(
            [x_ref[0, :, :, dx:dx + w] for dx in range(3)], axis=0)
        term = jax.lax.dot_general(
            w_ref[dy], a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if dy == 0:
            acc[:] = term
        else:
            acc[:] += term
    o_ref[0] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def conv3x3_lowch(x, w, out_dtype=None):
    """3×3 same-padding conv, NCHW in / NCHW out, stride 1.

    Drop-in for ``lax.conv_general_dilated(x, w, (1,1), [(1,1),(1,1)],
    NCHW/OIHW)`` on shapes where H is a multiple of BH; built for the
    32-channel 1024² synthesis/encoder level.
    """
    n, c, h, wd = x.shape
    oc = w.shape[0]
    assert h % BH == 0, (h, BH)
    dt = x.dtype
    out_dtype = out_dtype or dt

    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    shifts = [xp[:, :, dy:dy + h, :] for dy in range(3)]  # [N,C,H,W+2] ×3
    # [O, I, ky, kx] → per-dy [O, kx*C + i] matching the kernel's concat
    wm = jnp.transpose(w, (2, 3, 1, 0)).reshape(3, 3 * c, oc)
    wm = jnp.transpose(wm, (0, 2, 1)).astype(dt)          # [3, O, 3C]

    in_block = pl.BlockSpec((1, c, BH, wd + 2), lambda n_, i: (n_, 0, i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(n, h // BH),
        in_specs=[in_block, in_block, in_block,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, oc, BH, wd),
                               lambda n_, i: (n_, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oc, h, wd), out_dtype),
        scratch_shapes=[pltpu.VMEM((oc, BH, wd), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * 9 * c * oc,
            bytes_accessed=(n * h * wd * (3 * c + oc)) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(*shifts, wm)
    return out
