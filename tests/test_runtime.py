"""Runtime tests: config banks (inheritance + macros), model construction
from the real configs, debug shrink, and log/grid helpers."""

import os

import numpy as np
import pytest

from shgan_tpu.runtime.config import (model_cfg_bank, dataset_cfg_bank,
                                      experiment_cfg_bank,
                                      apply_debug_shrink)


def test_model_bank_inheritance_and_macros():
    bank = model_cfg_bank()
    g = bank("shgan_g256")
    assert g["type"] == "comodgan_generator"
    # MODEL() macro expanded to nested config dicts
    assert g["args"]["encoder"]["type"] == "shgan_encoder"
    enc = g["args"]["encoder"]["args"]
    # super_cfg chain: shgan_e256 ← comodgan_e256 ← comodgan_e512
    assert enc["resolution"] == 256
    assert enc["ch_base"] == 32768
    assert enc["shu_channels"] == 32
    assert enc["use_dropout"] is True
    # mapping num_ws differs at 512
    g512 = bank("shgan_g512")
    assert g512["args"]["mapping"]["args"]["num_ws"] == 16
    assert g512["args"]["synthesis"]["args"]["resolution"] == 512


def test_model_bank_small_variants():
    bank = model_cfg_bank()
    s = bank("comodgan_g256_small")
    assert s["args"]["encoder"]["args"]["ch_base"] == 16384
    assert s["args"]["synthesis"]["args"]["ch_base"] == 16384


def test_config_banks_survive_chdir(tmp_path, monkeypatch):
    """The config root is absolutized at discovery: bank construction
    after a chdir (tools running from a log dir, tmp_path tests) must
    resolve the same configs/ as before (runtime/config.py
    _find_config_root)."""
    before = model_cfg_bank()("shgan_g256")
    monkeypatch.chdir(tmp_path)
    # a fresh bank class construction would glob the new cwd without the
    # abspath fix; the cross-bank DATASET()/MODEL() macros inside
    # experiment solve exercise the lazily-built banks too
    after = model_cfg_bank()("shgan_g256")
    assert after == before
    exp = experiment_cfg_bank()("shgan_ffhq256_eval")
    assert exp["model_g"]["type"] == "comodgan_generator"


def test_dataset_bank():
    bank = dataset_cfg_bank()
    d = bank("ffhqzip_val256_inpainting")
    assert d["type"] == "ffhqzip"
    assert d["mode"] == "val256"
    assert d["formatter"]["args"]["random_flip"] is False
    lama = bank("ffhqzip_val512_inpainting_lama3")
    assert lama["formatter"]["args"]["type"] == "thick"
    assert lama["mode"] == "val512"


def test_experiment_bank_and_debug_shrink():
    bank = experiment_cfg_bank()
    cfg = bank("shgan_ffhq256_eval")
    assert cfg["model_g"]["type"] == "comodgan_generator"
    assert cfg["model_g"]["args"]["encoder"]["type"] == "shgan_encoder"
    assert cfg["eval"]["dataset"]["type"] == "ffhqzip"
    assert cfg["eval"]["batch_size_per_gpu"] == 16
    assert cfg["eval"]["evaluator"][0]["type"] == "fid"
    cfg = apply_debug_shrink(cfg)
    assert cfg["eval"]["batch_size_per_gpu"] == 2
    assert cfg["eval"]["dataset"]["try_sample"] == 32


def test_all_eval_experiments_resolve():
    bank = experiment_cfg_bank()
    for name in ("shgan_ffhq256_eval", "shgan_ffhq512_eval",
                 "shgan_places256_eval", "shgan_places512_eval",
                 "comodgan_ffhq256_eval", "comodgan_ffhq512_eval",
                 "comodgan_places256_eval", "comodgan_places512_eval",
                 "shgan_ffhq256_train", "shgan_synthetic256_eval"):
        cfg = bank(name)
        assert "model_g" in cfg and "model_d" in cfg, name


def test_models_buildable_from_real_configs():
    """The full-size graph must construct (no init) from the shipped
    configs."""
    from shgan_tpu.models import get_model
    bank = model_cfg_bank()
    for name in ("shgan_g256", "comodgan_g512", "comodgan_d256"):
        m = get_model(bank(name))
        assert m is not None
    g = get_model(bank("shgan_g512"))
    assert g.num_ws == 16 and g.img_resolution == 512
    assert g.encoder.shu.input_res == 64


def test_save_image_grid(tmp_path):
    from shgan_tpu.runtime.stages import save_image_grid
    imgs = np.random.RandomState(0).randn(6, 3, 16, 16).astype(np.float32)
    p = str(tmp_path / "grid.png")
    save_image_grid(imgs, p, drange=(-1, 1), grid_size=(3, 2))
    from PIL import Image
    im = Image.open(p)
    assert im.size == (48, 32)


def test_draw_demo_grid_u8_formatter(tmp_path):
    """u8-transport formatters return 0..255 images; the demo grid must
    normalize them on the host (runtime/stages.py draw_demo_grid) — a
    raw-u8 passthrough would clip reals.png to all-white."""
    from shgan_tpu.data.formatters import RandomMaskFormatter
    from shgan_tpu.runtime.stages import draw_demo_grid

    rng = np.random.RandomState(0)
    res, n = 16, 4
    imgs = [rng.randint(0, 256, (3, res, res), dtype=np.uint8)
            for _ in range(n)]
    dataset = [{"image_u8": im, "unique_id": str(i)}
               for i, im in enumerate(imgs)]
    fmt = RandomMaskFormatter(random_flip=False, mask_resolution=res,
                              hole_range=[0, 1], impl="numpy")

    def stub_g(params, x, z, noise_mode="const"):
        return x[:, 1:4]  # the erased RGB channels, already [-1,1]

    draw_demo_grid(stub_g, {}, dataset, fmt, str(tmp_path), z_dim=8,
                   grid_size=(2, 2), batch=4)
    from PIL import Image
    real = np.asarray(Image.open(tmp_path / "demo" / "reals.png"))
    assert real.shape == (2 * res, 2 * res, 3)
    # tile (0,0) of reals.png must round-trip the first u8 image
    np.testing.assert_allclose(real[:res, :res].transpose(2, 0, 1)
                               .astype(np.int32),
                               imgs[0].astype(np.int32), atol=1)
    for name in ("fakes.png", "fakes_combined.png", "masks.png",
                 "erased.png"):
        assert (tmp_path / "demo" / name).exists()


def test_scalar_logger(tmp_path):
    import json
    from shgan_tpu.runtime.logging import ScalarLogger
    lg = ScalarLogger(str(tmp_path))
    lg.accumulate({"a": 1.0})
    lg.accumulate({"a": 3.0})
    means = lg.flush(10)
    assert means["a"] == pytest.approx(2.0)
    lg.close()
    rec = json.loads((tmp_path / "stats.jsonl").read_text().splitlines()[0])
    assert rec["step"] == 10 and rec["a"] == pytest.approx(2.0)
