"""2D convolution with fused up/downsampling for TPU.

TPU-native equivalent of the reference's ``conv2d_resample``
(`/root/reference/lib/model_zoo/stylegan_utils/conv2d_resample.py:57-154`).
The *contract* (padding algebra, flip conventions, fast-path ordering of
filter vs. conv) is preserved exactly; the *implementation* maps every path
onto a single ``lax.conv_general_dilated`` (correlation, MXU) plus at most
one depthwise FIR pass from :mod:`.upfirdn2d` — no torch-style
conv_transpose emulation is needed because XLA expresses transposed
convolution directly via ``lhs_dilation``.

Notably, the reference's up>1 path (`conv2d_resample.py:122-142`) performs:
per-group OI transpose → optional spatial flip → ``conv_transpose2d``.
Composing the channel swaps and spatial flips of torch's conv_transpose
lowering, the net operation is simply::

    lax.conv_general_dilated(x, w', lhs_dilation=(up, up),
                             padding=((kh-1-pyt, kh-1-pyt), (kw-1-pxt, kw-1-pxt)))

with ``w' = w`` spatially flipped iff ``flip_weight`` is False — i.e. the
same flip rule as every other path.  (The reference flips the weight for
TF-checkpoint compatibility at `conv2d_resample.py:136-138`; that behavior is
captured by the ``not flip_weight`` passed from the caller.)
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

from .upfirdn2d import upfirdn2d, _parse_padding, _get_filter_size

_DN = ("NCHW", "OIHW", "NCHW")


def _compose_fir_cfg():
    """(enabled, ch_max, ext_min) for the FIR-composed resampling route.

    SHGAN_COMPOSE_FIR=1 replaces the split (resampling conv + depthwise
    FIR blur) with ONE k+f-1 conv whose kernel has the blur taps composed
    in: 4× nominal conv FLOPs, but the blur's full-feature-map HBM
    round-trip disappears.  Only sensible where the conv is
    bandwidth-bound but the conv itself still fills the MXU — gated by
    SHGAN_COMPOSE_FIR_CHMIN (min in/out channels, default 64: below it
    the conv is lane-fill-bound and 4× FLOPs loses — measured 0.93× at
    64→32ch 512→1024², tools/bench_compose_up.py), SHGAN_COMPOSE_FIR_CH
    (max channels, default 128: above it the conv is compute-bound) and
    SHGAN_COMPOSE_FIR_EXT (min fine-grid extent, default 512).  Measured
    isolated wins at the defaults: up 256→512 128→64ch 1.26×, down
    512→256 64→128ch 1.21× (v5e bf16).  Same trick as the folded
    domain's fold_weight_up/down_composed (ops/folded.py), here in the
    UNfolded domain.
    """
    if os.environ.get("SHGAN_COMPOSE_FIR", "0") != "1":
        return None
    return (int(os.environ.get("SHGAN_COMPOSE_FIR_CHMIN", "64")),
            int(os.environ.get("SHGAN_COMPOSE_FIR_CH", "128")),
            int(os.environ.get("SHGAN_COMPOSE_FIR_EXT", "512")))


def _compose_fir_eligible(x, w, f, groups, fine_ext):
    cfg = _compose_fir_cfg()
    if cfg is None or f is None or groups != 1:
        return False
    ch_min, ch_max, ext_min = cfg
    if getattr(f, "ndim", 0) != 2:   # separable 1D filters stay split
        return False
    kh, kw = int(w.shape[2]), int(w.shape[3])
    if kh <= 1 or kw <= 1:           # 1x1 convs: nothing to fuse with
        return False
    co, ci = int(w.shape[0]), int(w.shape[1])
    if min(co, ci) < ch_min or max(co, ci) > ch_max:
        return False
    return fine_ext >= ext_min


def _fir_compose_kernel(w, f, flip_filter, gain):
    """Compose the FIR into the conv kernel: the split pipeline is two
    correlations (lax conv ∘ upfirdn), whose composition is one
    correlation with ``K = w *_full F_c`` (plain full convolution of the
    kernels; ``F_c`` is the correlation kernel upfirdn actually applies,
    i.e. ``flip(f)`` when flip_filter=False).  Expressed as a full-padded
    lax correlation of ``w`` with ``flip(F_c)``.  ``w`` must already
    carry the caller's flip_weight handling."""
    co, ci, kh, kw = (int(s) for s in w.shape)
    fh, fw = int(f.shape[0]), int(f.shape[1])
    kern = f if not flip_filter else f[::-1, ::-1]
    k = lax.conv_general_dilated(
        w.reshape(co * ci, 1, kh, kw).astype(jnp.float32),
        (jnp.asarray(kern, jnp.float32) * gain)[None, None],
        window_strides=(1, 1),
        padding=[(fh - 1, fh - 1), (fw - 1, fw - 1)],
        dimension_numbers=_DN)
    return k.reshape(co, ci, kh + fh - 1, kw + fw - 1)


def _maybe_flip(w, flip_weight):
    """lax conv performs correlation (same as torch conv2d); flipping the
    kernel spatially turns it into true convolution
    (`conv2d_resample.py:32-34`)."""
    if not flip_weight:
        w = w[:, :, ::-1, ::-1]
    return w


def _conv2d(x, w, stride=1, padding=(0, 0), groups=1, flip_weight=True):
    """Plain correlation, torch-conv2d-compatible. padding=(py, px)."""
    w = _maybe_flip(w, flip_weight)
    py, px = padding
    from .conv1024 import conv1024_eligible
    if conv1024_eligible(x.shape, w.shape, stride, groups, (py, px)):
        # measured 1.15× on the MXU-starved 32-channel ≥1024² level
        # (docs/perf_ab.json "1024² conv formulations"); opt-in via
        # set_conv1024_impl — eval/bench single-chip only
        from .conv1024 import conv3x3_lowch
        return conv3x3_lowch(x, w.astype(x.dtype))
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(py, py), (px, px)],
        dimension_numbers=_DN,
        feature_group_count=groups,
    )


def _conv2d_up(x, w, up, padding, groups=1, flip_weight=True):
    """Transposed-conv-equivalent upsampling conv via lhs_dilation.

    Matches torch ``conv_transpose2d(x, w_t, stride=up, padding=(pyt, pxt))``
    where ``w_t`` is the per-group OI-transposed kernel, as invoked by the
    reference up path (`conv2d_resample.py:122-136`) — see module docstring
    for the derivation.  padding=(pyt, pxt) are the torch-side pads.
    """
    w = _maybe_flip(w, flip_weight)
    kh, kw = w.shape[2], w.shape[3]
    pyt, pxt = padding
    from .subpixel import subpixel_eligible
    if subpixel_eligible(w.shape, up, (pyt, pxt), groups):
        # phase-decomposed transposed conv: computes only 16/36 of the
        # nominal taps on a 4×-wider output-channel GEMM over the coarse
        # grid (ops/subpixel.py); opt-in via set_subpixel_impl
        from .subpixel import conv2d_up_phase
        return conv2d_up_phase(x, w.astype(x.dtype), (pyt, pxt))
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(kh - 1 - pyt, kh - 1 - pyt), (kw - 1 - pxt, kw - 1 - pxt)],
        lhs_dilation=(up, up),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )


def conv2d_resample(x, w, f=None, up=1, down=1, padding=0, groups=1,
                    flip_weight=True, flip_filter=False):
    """2D convolution with optional up/downsampling (padding applied once,
    w.r.t. the upsampled image) — contract of `conv2d_resample.py:57-80`.

    Args:
        x: ``[N, C_in, H, W]``.
        w: ``[C_out, C_in // groups, kh, kw]``.
        f: FIR filter constant from ``setup_filter`` (None = identity).
        up, down: integer resampling factors.
        padding: signed padding w.r.t. the upsampled image.
        groups: feature groups.
        flip_weight: False = convolution, True = correlation.
        flip_filter: same, for the FIR filter.
    """
    assert x.ndim == 4 and w.ndim == 4
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    out_channels, in_channels_per_group, kh, kw = (int(s) for s in w.shape)
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Adjust padding for the resampling FIR (conv2d_resample.py:93-102).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # Fast path: 1x1 conv + downsample → downsample first (cheaper conv).
    if kw == 1 and kh == 1 and down > 1 and up == 1:
        x = upfirdn2d(x, f, down=down, padding=[px0, px1, py0, py1],
                      flip_filter=flip_filter)
        return _conv2d(x, w, groups=groups, flip_weight=flip_weight)

    # Fast path: 1x1 conv + upsample → convolve first.
    if kw == 1 and kh == 1 and up > 1 and down == 1:
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        return upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1],
                         gain=up ** 2, flip_filter=flip_filter)

    # Fast path: downsample via conv window strides.
    if down > 1 and up == 1:
        if (_compose_fir_eligible(x, w, f, groups, int(x.shape[2]))
                and min(px0, px1, py0, py1) >= 0):
            # one strided conv with the blur taps composed into the
            # kernel (k -> k+f-1): deletes the blur's HBM round-trip
            k = _fir_compose_kernel(
                _maybe_flip(w, flip_weight), f, flip_filter, 1.0)
            return lax.conv_general_dilated(
                x, k.astype(x.dtype), window_strides=(down, down),
                padding=[(py0, py1), (px0, px1)], dimension_numbers=_DN)
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1],
                      flip_filter=flip_filter)
        return _conv2d(x, w, stride=down, groups=groups,
                       flip_weight=flip_weight)

    # Upsample (optional extra downsample) via lhs-dilated conv.
    if up > 1:
        # Padding split between the dilated conv and the FIR pass
        # (conv2d_resample.py:130-139).
        px0 -= kw - 1
        px1 -= kw - up
        py0 -= kh - 1
        py1 -= kh - up
        pxt = max(min(-px0, -px1), 0)
        pyt = max(min(-py0, -py1), 0)
        if (down == 1
                and _compose_fir_eligible(x, w, f, groups,
                                          int(x.shape[2]) * up)
                and min(kh - 1 + py0, kh - 1 + py1,
                        kw - 1 + px0, kw - 1 + px1) >= 0):
            # one lhs-dilated conv with the blur composed into the kernel
            # (k -> k+f-1, gain up² folded in); the composed padding is
            # the dilated conv's (k-1-pt) plus the FIR's (p+pt) = k-1+p
            # per side.  Alignment verified vs the split path at 1.9e-7
            # (tools/bench_compose_up.py + tests/test_conv_resample.py).
            k = _fir_compose_kernel(
                _maybe_flip(w, flip_weight), f, flip_filter, up ** 2)
            return lax.conv_general_dilated(
                x, k.astype(x.dtype), window_strides=(1, 1),
                padding=[(kh - 1 + py0, kh - 1 + py1),
                         (kw - 1 + px0, kw - 1 + px1)],
                lhs_dilation=(up, up), dimension_numbers=_DN)
        # Reference passes flip_weight=(not flip_weight) into its
        # conv_transpose wrapper; composed with torch conv_transpose's
        # inherent spatial flip, the net lax kernel flip rule is again
        # plain ``not flip_weight`` (see module docstring).
        x = _conv2d_up(x, w, up=up, padding=(pyt, pxt), groups=groups,
                       flip_weight=flip_weight)
        x = upfirdn2d(x, f, padding=[px0 + pxt, px1 + pxt, py0 + pyt, py1 + pyt],
                      gain=up ** 2, flip_filter=flip_filter)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    # Plain conv with symmetric non-negative padding.
    if up == 1 and down == 1:
        if px0 == px1 and py0 == py1 and px0 >= 0 and py0 >= 0:
            return _conv2d(x, w, padding=(py0, px0), groups=groups,
                           flip_weight=flip_weight)

    # Generic fallback: signed pad, then conv.
    x = upfirdn2d(x, (f if up > 1 else None), up=up,
                  padding=[px0, px1, py0, py1], gain=up ** 2,
                  flip_filter=flip_filter)
    x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
