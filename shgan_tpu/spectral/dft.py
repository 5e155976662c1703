"""rfft2 / irfft2 as matmul-DFTs for the MXU.

The SHU's spectra are tiny (≤64×33 per channel, `shgan.py:313-335`), but
XLA's generic FFT op on TPU is slow out of proportion — an A/B of
shgan_g512 vs comodgan_g512 puts the SHU at ~8% of the whole 512² forward
step.  At these sizes a DFT is just two small matrix products, which the
MXU does essentially for free, so we express

    rfft2(x)  = E_H @ x @ E_W        (complex, via 6 real matmuls)
    irfft2(X) = real-expand(G_H @ X) @ P_W   (6 real matmuls)

with the DFT matrices built once per (shape, norm) in numpy at trace time.
The inverse matrices are *probed* from ``np.fft.irfft`` responses to unit
vectors, so the half-spectrum hermitian bookkeeping (odd/even W, DC and
Nyquist columns) is exact by construction.

Both functions use ``norm='forward'`` semantics to match the reference
(`shgan.py:313,335`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

# tiny matmuls: run them in full fp32 (3-pass) so SHU parity stays ≤1e-3
_PREC = "highest"


@functools.lru_cache(maxsize=None)
def _rfft2_mats(h, w):
    """Matrices for forward rfft2 with norm='forward' on [..., h, w]."""
    # last-axis rfft: T[.., l] = Σ_w x[.., w] e^{-2πi w l / w}, l < w//2+1
    L = w // 2 + 1
    wgrid, lgrid = np.meshgrid(np.arange(w), np.arange(L), indexing="ij")
    ang = -2.0 * np.pi * wgrid * lgrid / w
    cw = np.cos(ang).astype(np.float32)          # [w, L]
    sw = np.sin(ang).astype(np.float32)          # [w, L]
    # H-axis full fft: X[k, l] = Σ_h T[h, l] e^{-2πi h k / h}
    kgrid, hgrid = np.meshgrid(np.arange(h), np.arange(h), indexing="ij")
    ang = -2.0 * np.pi * kgrid * hgrid / h
    eh_re = np.cos(ang).astype(np.float32)       # [h, h]
    eh_im = np.sin(ang).astype(np.float32)
    scale = np.float32(1.0 / (h * w))            # norm='forward'
    return cw, sw, eh_re, eh_im, scale


@functools.lru_cache(maxsize=None)
def _irfft2_mats(h, w):
    """Matrices for irfft2 with norm='forward' onto [..., h, w].

    The last-axis irfft is probed column-by-column from numpy so the
    half-spectrum symmetry handling is exact.
    """
    L = w // 2 + 1
    # H-axis inverse fft (no scaling under norm='forward'):
    # U[h, l] = Σ_k X[k, l] e^{+2πi h k / h}
    hgrid, kgrid = np.meshgrid(np.arange(h), np.arange(h), indexing="ij")
    ang = 2.0 * np.pi * hgrid * kgrid / h
    gh_re = np.cos(ang).astype(np.float32)       # [h, h]
    gh_im = np.sin(ang).astype(np.float32)
    # last-axis irfft responses: x[.., :] = U_re @ p_re + U_im @ p_im
    p_re = np.zeros((L, w), np.float32)
    p_im = np.zeros((L, w), np.float32)
    for l in range(L):
        e = np.zeros(L, np.complex64)
        e[l] = 1.0
        p_re[l] = np.fft.irfft(e, n=w, norm="forward").astype(np.float32)
        e[l] = 1.0j
        p_im[l] = np.fft.irfft(e, n=w, norm="forward").astype(np.float32)
    return gh_re, gh_im, p_re, p_im


def rfft2_matmul(x):
    """= jnp.fft.rfft2(x, norm='forward') for real [..., h, w] input,
    returned as an (re, im) float32 pair."""
    h, w = int(x.shape[-2]), int(x.shape[-1])
    cw, sw, eh_re, eh_im, scale = _rfft2_mats(h, w)
    cw, sw = jnp.asarray(cw), jnp.asarray(sw)
    eh_re, eh_im = jnp.asarray(eh_re), jnp.asarray(eh_im)
    x = x.astype(jnp.float32)
    t_re = jnp.matmul(x, cw, precision=_PREC)     # [..., h, L]
    t_im = jnp.matmul(x, sw, precision=_PREC)
    x_re = jnp.einsum("kh,...hl->...kl", eh_re, t_re, precision=_PREC) \
        - jnp.einsum("kh,...hl->...kl", eh_im, t_im, precision=_PREC)
    x_im = jnp.einsum("kh,...hl->...kl", eh_re, t_im, precision=_PREC) \
        + jnp.einsum("kh,...hl->...kl", eh_im, t_re, precision=_PREC)
    return x_re * scale, x_im * scale


def irfft2_matmul(x_re, x_im, s):
    """= jnp.fft.irfft2(x_re + 1j*x_im, s=s, norm='forward') for a
    half-spectrum [..., s[0], s[0]//2+1] input (crop done by the caller)."""
    h, w = int(s[0]), int(s[1])
    gh_re, gh_im, p_re, p_im = _irfft2_mats(h, w)
    gh_re, gh_im = jnp.asarray(gh_re), jnp.asarray(gh_im)
    p_re, p_im = jnp.asarray(p_re), jnp.asarray(p_im)
    x_re = x_re.astype(jnp.float32)
    x_im = x_im.astype(jnp.float32)
    u_re = jnp.einsum("hk,...kl->...hl", gh_re, x_re, precision=_PREC) \
        - jnp.einsum("hk,...kl->...hl", gh_im, x_im, precision=_PREC)
    u_im = jnp.einsum("hk,...kl->...hl", gh_re, x_im, precision=_PREC) \
        + jnp.einsum("hk,...kl->...hl", gh_im, x_re, precision=_PREC)
    return (jnp.matmul(u_re, p_re, precision=_PREC)
            + jnp.matmul(u_im, p_im, precision=_PREC))
