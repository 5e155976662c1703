"""Known-good per-chip batch boundaries for the full-size models on TPU.

Measured on v5e (one chip, remote compile helper).  Failure classes a
user can hit with nothing but a 15-25 minute wait and an opaque
``HTTP 500: tpu_compile_helper subprocess exit code 1``:

* **256², per-chip batch > 104** — the full-size generator fails to
  COMPILE.  r5 component bisect (tools/bisect_compile.py, AOT
  lower+compile per piece): encoder alone PASSES at 120, synthesis alone
  PASSES at 120, the combined generator FAILS at 112/120/128 and passes
  at 104 — a whole-program limit, not a single op (SHU is not involved —
  plain comodgan fails identically).  Ledger: docs/perf_ab.json r5
  bisect record.
* **512², per-chip batch > 120** — compiles but is ResourceExhausted at
  run time (bs=120 peaks at 13.8 GB of 16 GB HBM; 128 OOMs).
* **1024², UNFOLDED generator, per-chip batch > 16** — the res-1024
  synthesis block alone fails to compile at batch 18/20/22/24 (bisect
  stage ``synblock:1024``; every other block and the truncated pyramid
  pass).  The default folded domain (SHGAN_FOLD=1 at >=1024²) does NOT
  hit this: the folded generator compiles and runs at batch 32/48 —
  *provided* the 1024-res noise layer is NOT routed through the Pallas
  noise kernel (ops/noise.py gates it to <=512-res layers; with the
  Pallas kernel on the 1024-res layer, batch >= 18 reproduces the
  HTTP-500).  Known-good bench point: batch 32 at 122 img/s.

This module turns the boundaries into an immediate, actionable config
error.  ``SHGAN_SKIP_BATCH_LIMITS=1`` bypasses (other TPU generations
may differ; re-measure and update the table).
"""

from __future__ import annotations

import os

# resolution → max known-good PER-CHIP batch for the full-size
# (ch_base 32768) generator, with the failure mode hit just above it.
# 1024² assumes the default folded domain + res-gated Pallas noise
# (unfolded caps at 16 — see module docstring).
MAX_BATCH = {
    256: (104, "remote-compile failure (opaque HTTP 500; 112/120/128 "
               "fail, 104 is fine — whole-program limit, both model "
               "halves compile alone at 120)"),
    512: (120, "HBM ResourceExhausted (13.8 GB peak at 120 of 16 GB; "
               "128 OOMs)"),
    1024: (48, "measured good through 48 folded (32 is the throughput "
               "optimum); the UNFOLDED generator caps at 16 — the "
               "res-1024 synthesis block alone fails the remote compile "
               "at batch >= 18"),
}


def validate_per_chip_batch(resolution, per_chip_batch, where="eval"):
    """Raise early (before a 20-minute compile) when a known-bad
    (resolution, per-chip batch) is configured on a TPU backend."""
    if os.environ.get("SHGAN_SKIP_BATCH_LIMITS") == "1":
        return
    import jax
    if jax.default_backend() != "tpu":
        return
    lim = MAX_BATCH.get(int(resolution))
    if lim is None:
        return
    cap, why = lim
    if per_chip_batch > cap:
        rows = "\n".join(
            f"    {r}²: per-chip batch ≤ {c}  (above: {w})"
            for r, (c, w) in sorted(MAX_BATCH.items()))
        raise ValueError(
            f"{where}: per-chip batch {per_chip_batch} at {resolution}² "
            f"exceeds the measured v5e boundary ({cap}): {why}.\n"
            f"  Known-good table (docs/perf_ab.json):\n{rows}\n"
            "  Lower batch_size[_per_gpu], or set "
            "SHGAN_SKIP_BATCH_LIMITS=1 to try anyway.")
