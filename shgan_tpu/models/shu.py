"""SHU — Spectral Hint Unit (the SH-GAN novelty).

Reference: ``SHU`` at `/root/reference/lib/model_zoo/shgan.py:252-336`.

Pipeline (all sizes static per resolution, so the FFTs, windows and basis
maps compile into one fused XLA computation):

  rfft2(norm='forward') → fftshift-by-concat along H → [real ‖ imag] channels
  → 1×1 conv → ReLU (spectral band-pass) → heterogeneous filter (einsum
  against the cweight basis) → complex recombine → per-resolution
  Gaussian-split: crop the centered ``[res, res//2+1]`` window, multiply the
  annular DoG map, unshift, irfft2 → {res: spatial hint}.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..spectral.cweight import make_cweight
from ..spectral.gaussian import build_gaussian_split_maps
from ..spectral.shu_ops import (heterogeneous_filter_apply, spectral_shift,
                                spectral_unshift)
from .layers import Conv2d
import jax


class SHU:
    def __init__(self, in_channels, out_channels, dfilter_freedom=(3, 2),
                 dfilter_type="piecewise_linear", input_res=256, lowest_res=4,
                 tail_sigma_mult=3, gaussian_at_input_res=False):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.input_res = input_res
        self.lowest_res = lowest_res
        self.freedom = tuple(dfilter_freedom)
        self.conv0 = Conv2d(in_channels * 2, in_channels * 2, 1, 1, 0)
        self.reslist = [2 ** i for i in range(int(np.log2(lowest_res)),
                                              int(np.log2(input_res)) + 1)]
        # trace-time constants
        self.gaussian_weight_map = build_gaussian_split_maps(
            input_res, lowest_res, tail_sigma_mult, gaussian_at_input_res)
        self.cweight = make_cweight(
            half_size=list(self.freedom),
            half_sample=[input_res, input_res // 2 + 1], type=dfilter_type)

    def init(self, key):
        k0, k1 = jax.random.split(key)
        oc2 = self.out_channels * 2
        fh, fw = self.freedom
        params = {"conv0": self.conv0.init(k0)}
        # df1 init N(1/(2·out), 0.1/(2·out)) (shgan.py:275)
        params["df1"] = {"weight": (
            1.0 / oc2 + jax.random.normal(
                k1, (self.in_channels * 2, oc2 * fh * fw), jnp.float32)
            * (0.1 / oc2))}
        return params

    def __call__(self, params, x):
        """x: [N, in_channels, input_res, input_res] →
        {res: [N, out_channels, res, res]}.

        The DFTs run as matmul-DFTs on the MXU (`..spectral.dft`) — XLA's
        FFT op on TPU costs ~8% of the whole 512² step at these tiny
        spectrum sizes; the matmul form is exact and nearly free.
        """
        from ..spectral.dft import rfft2_matmul, irfft2_matmul
        re, im = rfft2_matmul(x.astype(jnp.float32))
        re, im = spectral_shift(re), spectral_shift(im)
        ff = jnp.concatenate([re, im], axis=1)
        ff = self.conv0(params["conv0"], ff)
        ff = jnp.maximum(ff, 0.0)
        ff = heterogeneous_filter_apply(params["df1"]["weight"], ff,
                                        self.cweight, self.out_channels * 2)
        oc = self.out_channels
        re, im = ff[:, :oc], ff[:, oc:]

        output = {}
        half = self.input_res // 2
        for resi in self.reslist:
            sl = (slice(None), slice(None),
                  slice(half - resi // 2, half + resi // 2),
                  slice(0, resi // 2 + 1))
            gmap = self.gaussian_weight_map[resi][None, None]
            sp_re = spectral_unshift(re[sl] * gmap, resi)
            sp_im = spectral_unshift(im[sl] * gmap, resi)
            output[resi] = irfft2_matmul(sp_re, sp_im, s=(resi, resi))
        return output
