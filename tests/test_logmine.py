"""Log-mining utilities (runtime/logmine.py) — the offline
gather_result/plotter of the reference (log_service.py:264-542)."""

import json
import os

import pytest

from shgan_tpu.runtime.logmine import (gather_result, format_result_table,
                                       load_stats, plotter)


@pytest.fixture()
def log_tree(tmp_path):
    a = tmp_path / "shgan_ffhq" / "001" / "evalA"
    b = tmp_path / "shgan_ffhq" / "002" / "evalB"
    for d, fid in [(a, 4.5), (b, 4.2)]:
        d.mkdir(parents=True)
        (d / "result.json").write_text(json.dumps(
            {"fid": {"fid": fid}, "psnr": {"psnr": 16.0}}))
    t = tmp_path / "shgan_ffhq" / "003" / "train"
    t.mkdir(parents=True)
    with open(t / "stats.jsonl", "w") as f:
        for step in range(0, 3000, 1000):
            f.write(json.dumps({"step": step, "time": 0.0,
                                "loss_g": 1.0 - step / 1e4,
                                "loss_d": 0.5}) + "\n")
    return tmp_path


def test_gather_and_table(log_tree):
    res = gather_result(str(log_tree))
    assert len(res) == 2
    vals = sorted(v["fid.fid"] for v in res.values())
    assert vals == [4.2, 4.5]
    res_f = gather_result(str(log_tree), metric_keys=["psnr.psnr"])
    assert all(set(v) == {"psnr.psnr"} for v in res_f.values())
    table = format_result_table(res)
    assert "fid.fid" in table and "4.2000" in table


def test_load_stats_and_plotter(log_tree):
    d = os.path.join(str(log_tree), "shgan_ffhq", "003", "train")
    records = load_stats(d)
    assert len(records) == 3 and records[-1]["step"] == 2000
    pytest.importorskip("matplotlib")
    out = plotter(d, keys=("loss_g", "loss_d"),
                  out_png=os.path.join(str(log_tree), "curves.png"))
    assert os.path.exists(out)
