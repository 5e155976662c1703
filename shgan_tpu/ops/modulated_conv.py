"""Modulated / demodulated convolution (StyleGAN2 core op), TPU-first.

Reference: ``modulated_conv2d`` at
`/root/reference/lib/model_zoo/stylegan.py:103-193`.

The reference's "fused" path materializes a per-sample weight tensor
``[N, O, I, kh, kw]`` and runs a grouped convolution with groups = batch
(`stylegan.py:183-193`) — a CUDA-friendly trick that is hostile to the TPU
MXU (tiny per-group matmuls, huge weight materialization at 512-channel
layers).  We therefore always use the mathematically identical
activation-scaling formulation (`stylegan.py:172-181`):

    y = dcoef ⊙ conv( x ⊙ styles, weight )        (demodulated case)

with the demodulation coefficients computed WITHOUT materializing the
per-sample weights, exploiting separability of the sum of squares::

    dcoef[n,o] = rsqrt( Σ_i (Σ_{kh,kw} w[o,i]²) · s[n,i]²  + 1e-8 )
               = rsqrt( s² @ wsq.T + 1e-8 ),   wsq[o,i] = Σ_k w[o,i,·,·]²

— one [N,I]×[I,O] matmul instead of an [N,O,I,kh,kw] tensor.  This keeps
the main convolution a single large batched conv on the MXU and everything
else a fused elementwise epilogue.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .conv_resample import conv2d_resample


def modulated_conv2d(x, weight, styles, noise=None, up=1, down=1, padding=0,
                     resample_filter=None, demodulate=True, flip_weight=True,
                     folded_in=False, folded_out=False):
    """
    Args:
        x:       [N, I, H, W] input activations ([N, 4I, H/2, W/2]
                 phase-major if ``folded_in`` — see :mod:`.folded`).
        weight:  [O, I, kh, kw] convolution weights.
        styles:  [N, I] modulation coefficients.
        noise:   optional broadcastable noise added to the output; when
                 ``folded_out`` it must be pre-folded to a [..., 4, h, w]
                 phase block (``folded.fold_noise``) and is broadcast over
                 the per-phase channel groups.
        up/down/padding/resample_filter: resampling config, as in
                 :func:`conv2d_resample`.
        demodulate: apply weight demodulation.
        flip_weight: False = convolution, True = correlation.
        folded_in/folded_out: run the conv in the space-to-depth folded
                 domain (exact; measured 1.5-2.6× on the C≤64 levels —
                 ops/folded.py).  Supported combinations mirror the block
                 topology: s1/1×1 (both folded), up=2 (folded_out only).
    """
    N = x.shape[0]
    O, I, kh, kw = (int(s) for s in weight.shape)
    assert styles.shape == (N, I), (styles.shape, (N, I))

    # StyleGAN3-style pre-normalization (stylegan.py:144-147): weight to unit
    # RMS over [I,kh,kw]; styles to unit RMS over ALL elements (note: the
    # reference's styles.square().mean() is a global mean — batch included).
    if demodulate:
        weight = weight * lax.rsqrt(
            jnp.square(weight).mean(axis=(1, 2, 3), keepdims=True))
        styles = styles * lax.rsqrt(jnp.square(styles).mean())

    dcoefs = None
    if demodulate:
        wsq = jnp.square(weight).sum(axis=(2, 3))            # [O, I]
        dcoefs = lax.rsqrt(jnp.square(styles) @ wsq.T + 1e-8)  # [N, O]

    s_in = styles
    if folded_in:
        from .folded import tile_channel_vec
        s_in = tile_channel_vec(styles)                      # [N, 4I]
    x = x * s_in.astype(x.dtype)[:, :, None, None]

    if folded_in or folded_out:
        from . import folded as _fold
        w = weight.astype(x.dtype)
        if up == 2 and down == 1 and kh == kw == 3:
            assert folded_out and not folded_in
            from .conv_resample import _maybe_flip
            x = _fold.conv_up_folded(x, _maybe_flip(w, flip_weight),
                                     resample_filter)
        elif up == 1 and down == 1 and kh == kw == 3:
            assert folded_in and folded_out
            from .conv_resample import _maybe_flip
            x = _fold.conv_s1_folded(x, _maybe_flip(w, flip_weight))
        elif up == 1 and down == 1 and kh == kw == 1:
            assert folded_in and folded_out
            x = _fold.conv_1x1_folded(x, w)
        else:
            raise NotImplementedError((up, down, kh, kw, folded_in,
                                       folded_out))
    else:
        x = conv2d_resample(x, weight.astype(x.dtype), f=resample_filter,
                            up=up, down=down, padding=padding,
                            flip_weight=flip_weight)

    d_out = dcoefs
    if folded_out and demodulate:
        from .folded import tile_channel_vec
        d_out = tile_channel_vec(dcoefs)                     # [N, 4O]

    if folded_out and noise is not None:
        # noise is a folded [..., 4, h, w] phase block broadcast across
        # the per-phase channel groups of the phase-major layout
        n, c4, h, w_ = x.shape
        xr = x.reshape(n, 4, c4 // 4, h, w_)
        if demodulate:
            xr = xr * d_out.astype(x.dtype).reshape(n, 4, c4 // 4)[
                :, :, :, None, None]
        xr = xr + noise.astype(x.dtype)[..., :, None, :, :]
        return xr.reshape(n, c4, h, w_)
    if demodulate and noise is not None:
        # fused multiply-add (reference uses the fma op, stylegan.py:176)
        x = x * d_out.astype(x.dtype)[:, :, None, None] + noise.astype(x.dtype)
    elif demodulate:
        x = x * d_out.astype(x.dtype)[:, :, None, None]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
