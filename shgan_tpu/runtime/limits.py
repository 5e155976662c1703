"""Known-good per-chip batch boundaries for the full-size models on TPU.

Measured on v5e (one chip, remote compile helper).  Two failure classes a
user can hit with nothing but a 15-25 minute wait and an opaque
``HTTP 500: tpu_compile_helper subprocess exit code 1``:

* **256², per-chip batch > 96** — the full-size generator fails to
  COMPILE (batch 120 and 128 both fail; 96 compiles and runs; SHU is not
  involved — plain comodgan fails identically).  Ledger:
  docs/perf_ab.json "compile boundary" record.
* **512², per-chip batch > 120** — compiles but is ResourceExhausted at
  run time (bs=120 peaks at 13.8 GB of 16 GB HBM; 128 OOMs).

This module turns both into an immediate, actionable config error.
``SHGAN_SKIP_BATCH_LIMITS=1`` bypasses (other TPU generations may differ;
re-measure and update the table).
"""

from __future__ import annotations

import os

# resolution → max known-good PER-CHIP batch for the full-size
# (ch_base 32768) generator, with the failure mode hit just above it
MAX_BATCH = {
    256: (96, "remote-compile failure (opaque HTTP 500 after ~20 min; "
              "batch 120/128 both fail, 96 is fine)"),
    512: (120, "HBM ResourceExhausted (13.8 GB peak at 120 of 16 GB; "
               "128 OOMs)"),
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
