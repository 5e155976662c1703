"""bench.py must be timeout-proof: the round JSON line is emitted after
EVERY completed leg, so an external kill mid-leg still leaves a parseable
best-so-far artifact in the output tail (VERDICT r4: BENCH_r04.json was
rc=124/parsed=null because the single emit lived after all four legs).

These tests monkeypatch the subprocess legs — no TPU, no compiles.
"""

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def _fake_sweep_rec():
    return {"metric": "512x512 inpainted images/sec/chip", "value": 350.0,
            "unit": "img/s/chip", "vs_baseline": 13.4,
            "detail": {"batch": 120, "backend": "tpu", "chips": 1,
                       "small": False}}


def _last_json(out):
    recs = []
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            recs.append(json.loads(line))
    return recs


@pytest.fixture()
def orchestrator_env(monkeypatch):
    monkeypatch.delenv("BENCH_DEVICE", raising=False)
    monkeypatch.delenv("BENCH_BATCH", raising=False)
    monkeypatch.setenv("BENCH_SUBPROC", "1")
    monkeypatch.setenv("BENCH_DEADLINE_S", "2400")
    monkeypatch.setattr(bench, "_T0", __import__("time").monotonic())
    monkeypatch.setattr(bench, "_probe_backend", lambda t: True)
    monkeypatch.setattr(bench, "_sweep_in_subprocesses",
                        lambda b: _fake_sweep_rec())


def test_kill_mid_e2e_still_leaves_parseable_tail(orchestrator_env,
                                                  monkeypatch, capsys):
    """Simulate the driver's kill landing during the e2e leg: the forward
    JSON must already be on stdout."""

    def killed(_batch):
        raise KeyboardInterrupt  # stands in for SIGTERM mid-subprocess

    monkeypatch.setattr(bench, "_e2e_in_subprocess", killed)
    with pytest.raises(KeyboardInterrupt):
        bench.main()
    recs = _last_json(capsys.readouterr().out)
    assert recs, "no JSON emitted before the kill"
    assert recs[-1]["value"] == 350.0
    assert recs[-1]["unit"] == "img/s/chip"


def test_all_legs_complete_emits_enriched_final(orchestrator_env,
                                                monkeypatch, capsys):
    monkeypatch.setattr(bench, "_e2e_in_subprocess",
                        lambda b: {"e2e_img_s": 290.0, "e2e_batch": b,
                                   "e2e_detector_ms": 50.0})
    monkeypatch.setattr(bench, "_train_in_subprocess",
                        lambda: {"train_img_s": 80.0, "train_mfu": 0.53})
    bench.main()
    recs = _last_json(capsys.readouterr().out)
    assert len(recs) == 3  # sweep, +e2e, +train(final)
    final = recs[-1]
    assert final["detail"]["e2e_img_s"] == 290.0
    assert final["detail"]["train_img_s"] == 80.0  # VERDICT r4 weak #6
    assert final["detail"]["train_mfu"] == 0.53
    assert "wall_s" in final["detail"]
    # earlier emits are prefixes of the same record
    assert recs[0]["value"] == final["value"]


def test_deadline_exhausted_skips_optional_legs(orchestrator_env,
                                                monkeypatch, capsys):
    monkeypatch.setenv("BENCH_DEADLINE_S", "0")

    def must_not_run(*a, **k):
        raise AssertionError("optional leg ran past the deadline")

    monkeypatch.setattr(bench, "_e2e_in_subprocess", must_not_run)
    monkeypatch.setattr(bench, "_train_in_subprocess", must_not_run)
    bench.main()
    recs = _last_json(capsys.readouterr().out)
    final = recs[-1]
    assert final["value"] == 350.0
    assert final["detail"]["e2e_skipped"] == "deadline"
    assert final["detail"]["train_skipped"] == "deadline"


def test_leg_timeout_respects_remaining_budget(monkeypatch):
    import time
    monkeypatch.setenv("BENCH_SUBPROC_TIMEOUT", "3600")
    monkeypatch.setenv("BENCH_DEADLINE_S", "2400")
    monkeypatch.setattr(bench, "_T0", time.monotonic() - 2300)
    assert bench._leg_timeout_s() == pytest.approx(100, abs=5)
    monkeypatch.setattr(bench, "_T0", time.monotonic() - 5000)
    assert bench._leg_timeout_s() == 60.0  # floor
    monkeypatch.setattr(bench, "_T0", time.monotonic())
    assert bench._leg_timeout_s() == pytest.approx(2400, abs=5)
