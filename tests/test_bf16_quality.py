"""bf16 quality guardrail (VERDICT r2 #2): the throughput config (bf16
blocks >16², bench.py default) must stay visually identical to the fp32
parity config on the scored artifact — the mask-composited uint8 output
(`/root/reference/lib/experiments/shgan_default.py:257-262`; the
reference's own fp16 knob ships OFF, `configs/model/comodgan.yaml:27,46`).

The authoritative full-size 512² bound is measured on TPU by
``tools/bf16_parity.py`` and recorded in ``docs/perf_ab.json``
("bf16 quality bound" record); re-run the tool after any change to the
block-dtype plan.  Under pytest the backend is CPU-pinned (conftest), so
here we (a) enforce the mechanism on a small model on CPU, and (b) verify
the measured TPU record is present and inside the gate bench.py's default
relies on.
"""

import json
import os.path as osp

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

# the gate: bf16 stays the bench default only while the full-size 512²
# composite deviates from fp32 by at most these bounds
GATE = {"max_u8_delta": 16, "min_psnr": 45.0, "min_ssim": 0.995,
        "max_frac_gt2": 0.02}


@pytest.mark.slow
def test_bf16_small_model_deviation_cpu():
    """Mechanism check on CPU (XLA CPU computes bf16 too): the small
    256² model's bf16 composite must stay close to fp32 — catches dtype
    plumbing regressions (e.g. a block accidentally accumulating in bf16)
    without TPU access."""
    from tools.bf16_parity import compare

    rec = compare(res=256, bs=2, small=True, seed=0, noise_mode="const")
    assert rec["max_u8_delta"] <= 32, rec
    assert rec["psnr_bf16_vs_fp32"] >= 40.0, rec
    assert rec["ssim_bf16_vs_fp32"] >= 0.99, rec


def test_bf16_tpu_bound_recorded_and_inside_gate():
    """The ledger must carry the measured full-size TPU bound, and the
    bound must satisfy the gate — this is what ties the bf16 throughput
    headline to the fp32 parity claim (they provably share one config)."""
    with open(osp.join(REPO, "docs", "perf_ab.json")) as f:
        ledger = json.load(f)
    recs = [r for r in ledger["records"]
            if "bf16 quality bound" in r.get("choice", "")]
    assert recs, ("docs/perf_ab.json has no 'bf16 quality bound' record — "
                  "run tools/bf16_parity.py on TPU and record the result")
    m = recs[0]["measured"]
    assert m["res"] == 512 and m["small"] is False
    assert m["max_u8_delta"] <= GATE["max_u8_delta"], m
    assert m["psnr_bf16_vs_fp32"] >= GATE["min_psnr"], m
    assert m["ssim_bf16_vs_fp32"] >= GATE["min_ssim"], m
    assert m["frac_gt2"] <= GATE["max_frac_gt2"], m
