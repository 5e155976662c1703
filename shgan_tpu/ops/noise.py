"""Per-layer noise injection RNG, Pallas-accelerated on TPU.

The reference draws per-pixel N(0,1) noise for every synthesis conv
(`/root/reference/lib/model_zoo/stylegan.py:282-283`).  In JAX the default
threefry PRNG is counter-based software hashing — measured at ~5.3 ms per
32×512² draw on v5e, ≈10% of the whole 512² generator step.  The TPU has a
hardware PRNG exposed through Pallas (``pltpu.prng_random_bits``); this
kernel seeds it per (batch, call) and converts raw bits to normals with
Box–Muller on the VPU, an order of magnitude cheaper than threefry.

SPMD note: ``pallas_call`` does not auto-partition under pjit, so the Pallas
path is only used when explicitly enabled for single-device execution
(bench / single-chip eval); sharded multi-chip training keeps
``jax.random.normal``, which XLA partitions natively.  Enable with
:func:`set_noise_impl` or ``SHGAN_PALLAS_NOISE=1``.

Noise quality: Box–Muller over the hardware PRNG is statistically
indistinguishable from threefry for noise *injection* (moments are exact;
the stream is not reproducible across impls — same caveat as the
reference's per-run ``torch.randn``).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

_IMPL = None  # None = auto (env), "jax", "pallas"


def set_noise_impl(impl):
    """impl: "jax" | "pallas" | None (auto via SHGAN_PALLAS_NOISE)."""
    global _IMPL
    assert impl in (None, "jax", "pallas")
    _IMPL = impl


def _use_pallas():
    if _IMPL is not None:
        return _IMPL == "pallas"
    return os.environ.get("SHGAN_PALLAS_NOISE") == "1"


def _pallas_max_res():
    """Largest per-layer resolution routed to the Pallas kernel.

    Measured r5 (bisect_r5 ledger record): with the 1024-res noise layer
    on the Pallas path, the remote TPU compile of the full folded g1024
    fails opaquely (HTTP 500) for batch >= 18 — batch 16 compiles, and
    the identical model with threefry noise compiles and runs at batch
    24/32 (117 img/s vs 103).  Capping the kernel at <= 512-res layers
    keeps the ~8% Pallas win on every other level while lifting the
    batch ceiling."""
    return int(os.environ.get("SHGAN_PALLAS_NOISE_MAX_RES", "512"))


def random_noise(rng, batch, resolution, dtype=jnp.float32):
    """N(0,1) noise ``[batch, 1, resolution, resolution]`` from a JAX key."""
    if (_use_pallas() and jax.default_backend() == "tpu"
            and 8 <= resolution <= _pallas_max_res()):
        return _pallas_normal(rng, batch, resolution).astype(dtype)[:, None]
    return jax.random.normal(rng, (batch, 1, resolution, resolution), dtype)


def _pallas_normal(rng, batch, resolution):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Two 32-bit seed words from the key; the kernel mixes in program_id so
    # every batch row gets an independent stream.
    seeds = jax.random.key_data(jax.random.fold_in(rng, resolution))
    seeds = seeds.reshape(-1)[:2].astype(jnp.uint32)

    def kernel(seed_ref, out_ref):
        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ jnp.uint32(0x9E3779B9) *
                        (i + 1).astype(jnp.uint32))
        # full Box–Muller: one (u1,u2) pair yields TWO normals (cos & sin
        # branches), halving both PRNG draws and transcendentals
        half = (1, resolution // 2, resolution)
        b1 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
        # int→float casts are unsupported in Mosaic; build uniforms by
        # stuffing 23 random mantissa bits under a 2^0 exponent:
        # bitcast(0x3F800000 | bits>>9) ∈ [1,2).
        one_exp = jnp.uint32(0x3F800000)
        f1 = pltpu.bitcast(one_exp | (b1 >> 9), jnp.float32)  # [1,2)
        f2 = pltpu.bitcast(one_exp | (b2 >> 9), jnp.float32)  # [1,2)
        u1 = 2.0 - f1   # (0,1] — log-safe
        u2 = f2 - 1.0   # [0,1)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = (2.0 * np.pi) * u2
        out_ref[:] = jnp.concatenate(
            [r * jnp.cos(theta), r * jnp.sin(theta)], axis=1)

    out = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (1, resolution, resolution),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, resolution, resolution),
                                       jnp.float32),
    )(seeds)
    return jax.lax.stop_gradient(out)
