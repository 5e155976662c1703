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
                     resample_filter=None, demodulate=True, flip_weight=True):
    """
    Args:
        x:       [N, I, H, W] input activations.
        weight:  [O, I, kh, kw] convolution weights.
        styles:  [N, I] modulation coefficients.
        noise:   optional broadcastable noise added to the output.
        up/down/padding/resample_filter: resampling config, as in
                 :func:`conv2d_resample`.
        demodulate: apply weight demodulation.
        flip_weight: False = convolution, True = correlation.
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

    x = x * styles.astype(x.dtype)[:, :, None, None]
    x = conv2d_resample(x, weight.astype(x.dtype), f=resample_filter, up=up,
                        down=down, padding=padding, flip_weight=flip_weight)

    if demodulate and noise is not None:
        # fused multiply-add (reference uses the fma op, stylegan.py:176)
        x = x * dcoefs.astype(x.dtype)[:, :, None, None] + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
