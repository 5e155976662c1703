"""loadgen (pre-generated image) eval path + dataset cache
(reference ffhqzip_loadgen/DoubleLoader, ds_ffhq.py:388-456; --dscache)."""

import json
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from shgan_tpu.data.datasets import (get_dataset, SyntheticDataset,
                                     LoadGenDataset, CachedDataset)


@pytest.fixture()
def gen_dir(tmp_path):
    base = SyntheticDataset(resolution=32, length=6)
    d = tmp_path / "gen"
    d.mkdir()
    for i in range(len(base)):
        el = base[i]
        img = (el["image"].transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / f"{el['unique_id']}.png")
    return str(d)


def test_loadgen_dataset_pairs(gen_dir):
    ds = LoadGenDataset({"type": "synthetic",
                         "args": {"resolution": 32, "length": 6}}, gen_dir)
    assert len(ds) == 6
    el = ds[2]
    assert el["gen"].shape == el["image"].shape == (3, 32, 32)
    # gen should be a near-identical roundtrip of the synthetic image
    assert np.abs(el["gen"] - el["image"]).max() < 0.01


def test_cached_dataset_counts_loads():
    class Counting(SyntheticDataset):
        loads = 0

        def __getitem__(self, i):
            Counting.loads += 1
            return super().__getitem__(i)

    ds = CachedDataset(Counting(resolution=16, length=4))
    _ = ds[0]; _ = ds[0]; _ = ds[1]
    assert Counting.loads == 2


def test_get_dataset_cache_flag():
    ds = get_dataset({"type": "synthetic", "cache": True,
                      "args": {"resolution": 16, "length": 4}})
    assert isinstance(ds, CachedDataset)


def test_eval_stage_pregen(gen_dir, tmp_path):
    from shgan_tpu.runtime.stages import eval_stage
    cfg = {
        "env": {"rnd_seed": 0, "debug": True, "mesh_devices": 1},
        "model_g": None,  # never touched on the nog path
        "eval": {
            "log_dir": str(tmp_path / "log"),
            "batch_size": 4,
            "dataset": {"type": "loadgen",
                        "args": {"base": {"type": "synthetic",
                                          "args": {"resolution": 32,
                                                   "length": 6}},
                                 "gen_dir": gen_dir}},
            "evaluator": [{"type": "psnr"}, {"type": "ssim"}],
        },
    }
    rv = eval_stage()(cfg)
    assert rv["eval_rv"]["psnr"] > 30  # png roundtrip ≈ lossless
    res = json.load(open(osp.join(str(tmp_path / "log"), "result.json")))
    assert "psnr" in res and "ssim" in res
