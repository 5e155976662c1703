"""JAX ops for the Spectral Hint Unit forward path.

Reference: ``heterogeneous_filter.forward`` (`/root/reference/lib/model_zoo/shgan.py:143-160`)
and the shift-by-concat convention of ``SHU.forward`` (`shgan.py:313-335`).

The reference realizes the heterogeneous filter as a 1×1 conv to
``out·fh·fw`` channels followed by a weighted sum against the cached basis
maps.  On TPU we express the whole thing as ONE einsum

    o[n,o,h,w] = Σ_i Σ_f  x[n,i,h,w] · W[i,o,f] · cw[f,h,w]

which XLA contracts as a batched matmul on the MXU with the (tiny) basis
blend fused in — no intermediate [N, out·fh·fw, h, w] tensor in HBM.
"""

from __future__ import annotations

import jax.numpy as jnp


def heterogeneous_filter_apply(weight, x, cweight, out_channels):
    """Frequency-dependent 1×1 channel transform.

    Args:
        weight: [in_channels, out_channels * F] parameter (torch layout of
            ``heterogeneous_filter.weight``, `shgan.py:135-136`).
        x: [N, in_channels, h, w].
        cweight: [F, h, w] basis maps from :func:`..spectral.make_cweight`.
        out_channels: number of output channels.
    """
    n, ic, h, w = x.shape
    f = cweight.shape[0]
    wi_of = weight.reshape(ic, out_channels, f)
    cw = jnp.asarray(cweight, dtype=x.dtype)
    # fold cw into the contraction; XLA fuses this into one fused matmul+blend
    return jnp.einsum("nihw,iof,fhw->nohw", x, wi_of.astype(x.dtype), cw)


def spectral_shift(ff):
    """Move DC from row 0 to the center-ish row used by the reference
    (`shgan.py:315-317`): rows [H//2+1:] then rows [:H//2+1]."""
    h = ff.shape[2]
    return jnp.concatenate([ff[:, :, h // 2 + 1:], ff[:, :, :h // 2 + 1]],
                           axis=2)


def spectral_unshift(ff, res):
    """Inverse of the shift for a ``res``-row half-spectrum
    (`shgan.py:331-333`): rows [res - res//2 - 1:] then the rest."""
    k = res - res // 2 - 1
    return jnp.concatenate([ff[:, :, k:], ff[:, :, :k]], axis=2)
