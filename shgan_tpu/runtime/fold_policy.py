"""Default routing of MXU-starved low-channel levels into the exact
space-to-depth folded conv domain (ops/folded.py).

Measured on v5e (docs/perf_ab.json records 17, 23, 25-26): at 1024² the
32-channel levels run ~1.9-2.6× faster folded and the folded program
lifts the remote-compile batch cap from 16 to ≥48 (122 img/s at batch 32
vs 103 at 16); at ≤512² every folding variant LOSES (the folded-FLOP
inflation is not paid back at ≥64 channels), so the policy folds nothing
below 1024².

The policy only fills in ``fold_above_res`` when the config does not set
it — an explicit user config always wins.  Environment overrides:

* ``SHGAN_FOLD=0/1``   — force the policy off/on regardless of resolution.
* ``SHGAN_FOLD_CH``    — max channel count that folds (default 32).
* ``SHGAN_FOLD_SCOPE`` — ``both`` (default) | ``enc`` | ``syn``
  (mixed scopes are exact: generator._match_fold_layout re-lays skips).

Reference for the level being accelerated: the 32-channel up/conv pair of
`/root/reference/lib/model_zoo/stylegan.py:436-520` at 1024².
"""

from __future__ import annotations

import copy
import os


def apply_fold_policy(cfg_model_g, default_on=True, backend=None):
    """Return a (possibly copied) generator cfg with the measured folded
    defaults applied.

    Args:
        cfg_model_g: comodgan/shgan generator model cfg dict.
        default_on: policy default when SHGAN_FOLD is unset — True for
            the eval/serving paths; the train path passes False (folded
            training is exact by construction but has no measured
            baseline yet — opt in with SHGAN_FOLD=1).
        backend: platform the model will run on; ``None`` = ask jax.
            The folded domain is a TPU win — other backends are left
            untouched unless SHGAN_FOLD=1 forces it.
    """
    args = cfg_model_g.get("args") or {}
    enc = (args.get("encoder") or {}).get("args") or {}
    syn = (args.get("synthesis") or {}).get("args") or {}
    if not enc or not syn:
        return cfg_model_g                     # not a comodgan-shaped cfg
    if "fold_above_res" in enc or "fold_above_res" in syn:
        return cfg_model_g                     # explicit config wins
    res = int(syn.get("resolution") or enc.get("resolution") or 0)
    env = os.environ.get("SHGAN_FOLD")
    if env == "0":
        return cfg_model_g
    if env != "1":
        if not (default_on and res >= 1024):
            return cfg_model_g
        if backend is None:
            import jax
            backend = jax.default_backend()
        if backend != "tpu":
            return cfg_model_g

    fold_ch = int(os.environ.get("SHGAN_FOLD_CH", "32"))
    scope = os.environ.get("SHGAN_FOLD_SCOPE", "both")
    thr = max(int(enc.get("ch_base", 16384)) // (2 * fold_ch), 4)
    if res <= thr:
        return cfg_model_g
    out = copy.deepcopy(cfg_model_g)
    if scope in ("both", "enc"):
        out["args"]["encoder"]["args"]["fold_above_res"] = thr
    if scope in ("both", "syn"):
        out["args"]["synthesis"]["args"]["fold_above_res"] = thr
    return out
