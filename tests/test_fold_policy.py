"""The production folded-domain policy (runtime/fold_policy.py): eval and
serving fold the MXU-starved >=1024² levels on TPU by default; explicit
configs and env overrides win; nothing below 1024² ever folds by default
(three measured refutations, docs/perf_ab.json records 25-26)."""

import copy

import pytest

from shgan_tpu.runtime.config import model_cfg_bank
from shgan_tpu.runtime.fold_policy import apply_fold_policy


def _cfg(res):
    return model_cfg_bank()(f"shgan_g{res}")


def _folds(cfg):
    a = cfg["args"]
    return (a["encoder"]["args"].get("fold_above_res"),
            a["synthesis"]["args"].get("fold_above_res"))


def test_default_folds_1024_on_tpu(monkeypatch):
    monkeypatch.delenv("SHGAN_FOLD", raising=False)
    out = apply_fold_policy(_cfg(1024), backend="tpu")
    assert _folds(out) == (512, 512)        # ch_base 32768 // (2*32)


def test_default_leaves_512_alone(monkeypatch):
    monkeypatch.delenv("SHGAN_FOLD", raising=False)
    cfg = _cfg(512)
    out = apply_fold_policy(cfg, backend="tpu")
    assert out is cfg and _folds(out) == (None, None)


def test_non_tpu_backend_no_op(monkeypatch):
    monkeypatch.delenv("SHGAN_FOLD", raising=False)
    cfg = _cfg(1024)
    assert apply_fold_policy(cfg, backend="cpu") is cfg


def test_env_forces_on_any_backend_and_res(monkeypatch):
    monkeypatch.setenv("SHGAN_FOLD", "1")
    monkeypatch.setenv("SHGAN_FOLD_CH", "64")
    out = apply_fold_policy(_cfg(512), backend="cpu")
    assert _folds(out) == (256, 256)


def test_env_zero_disables(monkeypatch):
    monkeypatch.setenv("SHGAN_FOLD", "0")
    cfg = _cfg(1024)
    assert apply_fold_policy(cfg, backend="tpu") is cfg


def test_explicit_config_wins(monkeypatch):
    monkeypatch.delenv("SHGAN_FOLD", raising=False)
    cfg = _cfg(1024)
    cfg["args"]["synthesis"]["args"]["fold_above_res"] = 256
    out = apply_fold_policy(cfg, backend="tpu")
    assert out is cfg and _folds(out) == (None, 256)


@pytest.mark.parametrize("scope,want", [
    ("enc", (512, None)), ("syn", (None, 512)), ("both", (512, 512))])
def test_scope(monkeypatch, scope, want):
    monkeypatch.delenv("SHGAN_FOLD", raising=False)
    monkeypatch.setenv("SHGAN_FOLD_SCOPE", scope)
    assert _folds(apply_fold_policy(_cfg(1024), backend="tpu")) == want


def test_input_cfg_never_mutated(monkeypatch):
    monkeypatch.delenv("SHGAN_FOLD", raising=False)
    cfg = _cfg(1024)
    before = copy.deepcopy(cfg)
    apply_fold_policy(cfg, backend="tpu")
    assert cfg == before


def test_default_off_for_train_path(monkeypatch):
    # train_stage passes default_on=False: only SHGAN_FOLD=1 folds there
    monkeypatch.delenv("SHGAN_FOLD", raising=False)
    cfg = _cfg(1024)
    assert apply_fold_policy(cfg, default_on=False, backend="tpu") is cfg
