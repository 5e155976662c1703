"""Dataset variants added for reference parity: json-index ffhq,
ffhqsimple folder tree, openimages (pad-to-square + content_size), and the
DTD texture dataset (label lists + mixed order).  Fixtures synthesize the
on-disk layouts the reference consumes (`ds_ffhq.py:19-66,222-244`,
`ds_openimages.py:22-80`, `ds_texture.py:23-88`)."""

import json
import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from shgan_tpu.data.datasets import get_dataset


def _png(path, w, h, value):
    os.makedirs(osp.dirname(path), exist_ok=True)
    arr = np.full((h, w, 3), value, np.uint8)
    Image.fromarray(arr).save(path)


def test_ffhq_json_index(tmp_path):
    root = str(tmp_path)
    jinfo = {}
    for i in range(4):
        cat = "training" if i < 2 else "validation"
        rel = f"images1024x1024/{i:05d}.png"
        _png(osp.join(root, rel), 16, 16, i * 10)
        jinfo[str(i)] = {"category": cat, "image": {"file_path": rel}}
    # a missing file, tolerated only with allow_partial
    jinfo["9"] = {"category": "training",
                  "image": {"file_path": "images1024x1024/99999.png"}}
    with open(osp.join(root, "ffhq-dataset-v2.json"), "w") as f:
        json.dump(jinfo, f)

    ds = get_dataset({"type": "ffhq", "root_dir": root, "mode": "train",
                      "allow_partial": True})
    assert [e["unique_id"] for e in ds.load_info] == \
        ["00_train-00000", "00_train-00001"]
    el = ds[0]
    assert el["image"].shape == (3, 16, 16)

    ds = get_dataset({"type": "ffhq", "root_dir": root, "mode": "train+val",
                      "allow_partial": True})
    uids = sorted(e["unique_id"] for e in ds.load_info)
    assert uids == ["00_train-00000", "00_train-00001",
                    "50_val-00002", "50_val-00003"]

    with pytest.raises(ValueError):
        get_dataset({"type": "ffhq", "root_dir": root, "mode": "train",
                     "allow_partial": False})

    # resolution arg = R512Loader-style bicubic resize
    ds = get_dataset({"type": "ffhq", "root_dir": root, "mode": "val",
                      "allow_partial": True, "resolution": 8})
    assert ds[0]["image"].shape == (3, 8, 8)


def test_ffhqsimple(tmp_path):
    root = str(tmp_path)
    for i in range(3):
        _png(osp.join(root, "ffhq256x256", f"{i // 2:05d}",
                      f"{i:05d}.png"), 8, 8, i)
    ds = get_dataset({"type": "ffhqsimple", "root_dir": root,
                      "mode": "train256"})
    assert [e["unique_id"] for e in ds.load_info] == \
        ["00000", "00001", "00002"]
    assert ds[1]["image"].shape == (3, 8, 8)
    with pytest.raises(ValueError):
        get_dataset({"type": "ffhqsimple", "root_dir": root,
                     "mode": "val256"})


def test_openimages_fit_resolution_and_freeform_mask(tmp_path):
    root = str(tmp_path)
    _png(osp.join(root, "validation", "a", "img1.jpg"), 64, 32, 100)
    _png(osp.join(root, "validation", "img0.png"), 16, 16, 50)
    ds = get_dataset({"type": "openimages", "root_dir": root, "mode": "val",
                      "resolution": 32})
    uids = [e["unique_id"] for e in ds.load_info]
    assert "a-img1" in uids and "img0" in uids

    el = ds[uids.index("a-img1")]
    # 64x32 → fit long side to 32 → 32x16 content, padded to 32x32
    assert el["image"].shape == (3, 32, 32)
    assert el["content_size"] == (16, 32)
    assert el["image"][:, 16:, :].max() == 0  # zero padding below content
    assert el["image"][:, :16, :].min() > 0

    # small image is NOT upscaled (reference only downsizes)
    el0 = ds[uids.index("img0")]
    assert el0["content_size"] == (16, 16)

    # FreeFormMaskFormatter keeps the padding (mask=1) out of the hole
    from shgan_tpu.data.formatters import get_formatter
    fmt = get_formatter({"type": "FreeFormMaskFormatter",
                         "args": {"random_flip": False, "resolution": 32,
                                  "hole_range": [0, 1], "impl": "numpy"}})
    _x, mask, _uid = fmt(el)
    assert mask.shape == (32, 32)
    assert (mask[16:, :] == 1.0).all()


def test_texture_lists_and_mixed_order(tmp_path):
    root = str(tmp_path)
    files = {"banded": ["banded_0001.jpg", "banded_0002.jpg"],
             "dotted": ["dotted_0001.jpg"]}
    train_lines = []
    for tt, fns in files.items():
        for fn in fns:
            _png(osp.join(root, "dtd", "images", tt, fn), 12, 12, 77)
            train_lines.append(f"{tt}/{fn}")
    os.makedirs(osp.join(root, "dtd", "labels"), exist_ok=True)
    with open(osp.join(root, "dtd", "labels", "train1.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(osp.join(root, "dtd", "labels", "val1.txt"), "w") as f:
        f.write(train_lines[0] + "\n")

    ds = get_dataset({"type": "texture", "root_dir": root, "mode": "train1",
                      "resolution": 8})
    assert len(ds) == 3
    assert ds[0]["image"].shape == (3, 8, 8)

    # '+'-joined modes concatenate lists
    ds2 = get_dataset({"type": "texture", "root_dir": root,
                       "mode": "train1+val1", "resolution": 8})
    assert len(ds2) == 4

    # mixed order round-robins texture types with counter-prefixed uids
    ds3 = get_dataset({"type": "texture", "root_dir": root, "mode": "train1",
                       "resolution": 8, "mixed_order_on_texture_type": True})
    uids = [e["unique_id"] for e in ds3.load_info]
    assert uids[0].startswith("00000_") and uids[1].startswith("00001_")
    types2 = [u.split("_", 1)[1].rsplit("_", 1)[0] for u in uids[:2]]
    assert len(set(types2)) == 2  # first two cover two texture types


def test_dataset_bank_new_entries():
    from shgan_tpu.runtime.config import dataset_cfg_bank
    bank = dataset_cfg_bank()
    for name in ("ffhq_train", "ffhq_val", "ffhqsimple",
                 "openimages_val_1024", "openimages_train_1024",
                 "texture_train512_inpainting",
                 "texture_val512_inpainting"):
        cfg = bank(name)
        assert cfg["type"] in ("ffhq", "ffhqsimple", "openimages",
                               "texture"), name
