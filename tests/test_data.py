"""Data subsystem tests: mask generators bit-identical to the reference
under a shared numpy seed; sampler shard/pad semantics; pipelines."""

import sys

import numpy as np
import pytest

from shgan_tpu.data import (random_mask, MixedMaskGenerator, LAMA_SETTINGS,
                            SyntheticDataset, RandomMaskFormatter,
                            LamaMaskFormatter, CenterMaskFormatter,
                            shard_indices, DataShard, EvalPipeline)


def _stub_ref_deps():
    """Stub torchvision/pyspng so the reference data modules import."""
    import types
    for name in ("torchvision", "torchvision.models",
                 "torchvision.transforms", "pyspng"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "torchvision.transforms":
                mod.ToTensor = object
            if name == "pyspng":
                mod.load = lambda b: None
            sys.modules[name] = mod
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision"].transforms = (
        sys.modules["torchvision.transforms"])
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def _ref_random_mask(s, hole_range):
    import importlib
    _stub_ref_deps()
    mod = importlib.import_module("lib.data_factory.ds_ffhq")
    return mod.RandomMask(s, hole_range=list(hole_range))


def _ref_lama(setting):
    import importlib
    _stub_ref_deps()
    mod = importlib.import_module("lib.data_factory.lama_mask_utils")
    return mod.MixedMaskGenerator(**setting)


ffhq_import_ok = True
try:
    _ref_random_mask(32, (0, 1))
except Exception:  # torchvision/pyspng missing etc.
    ffhq_import_ok = False


@pytest.mark.skipif(not ffhq_import_ok,
                    reason="reference ds_ffhq not importable")
@pytest.mark.parametrize("seed", [0, 7, 123])
def test_random_mask_bit_identical(seed):
    np.random.seed(seed)
    want = _ref_random_mask(128, (0, 1))
    np.random.seed(seed)
    got = random_mask(128, (0, 1))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("kind,res", [("thin", 256), ("medium", 256),
                                      ("thick", 512)])
def test_lama_masks_bit_identical(kind, res):
    setting = LAMA_SETTINGS[(kind, res)]
    ref_gen = _ref_lama(setting)
    got_gen = MixedMaskGenerator(**setting)
    img = np.zeros((3, res, res), np.float32)
    for seed in (1, 2):
        np.random.seed(seed)
        import random
        random.seed(seed)
        want = ref_gen(img)
        np.random.seed(seed)
        random.seed(seed)
        got = got_gen(img)
        np.testing.assert_array_equal(got, want)


def test_random_mask_hole_range():
    np.random.seed(0)
    for _ in range(3):
        m = random_mask(64, (0.2, 0.8))
        ratio = 1 - m.mean()
        assert 0.2 < ratio < 0.8


def test_shard_indices_extend_semantics():
    # 10 items over 4 shards → 3 each, padded from the front (2 pads)
    all_idx, all_valid = [], []
    for s in range(4):
        idx, valid = shard_indices(10, s, 4, extend=True)
        assert len(idx) == 3
        all_idx.append(idx)
        all_valid.append(valid)
    flat = np.concatenate(all_idx)
    assert (np.sort(flat[np.concatenate(all_valid)]) == np.arange(10)).all()
    assert np.concatenate(all_valid).sum() == 10
    # padding reuses the front of the order (ds_sampler.py:58-68)
    assert flat[-2] == 0 and flat[-1] == 1


def test_shard_indices_truncate():
    idx, valid = shard_indices(10, 0, 4, extend=False)
    assert len(idx) == 2 and valid.all()


def test_datashard_batches_and_formatter():
    ds = SyntheticDataset(resolution=64, length=10)
    fmt = CenterMaskFormatter()
    shard = DataShard(ds, fmt, batch_size=4)
    batches = list(shard)
    assert len(batches) == 3
    real, mask, valid, uids = batches[-1]
    assert real.shape == (4, 3, 64, 64) and mask.shape == (4, 1, 64, 64)
    assert valid.sum() == 2  # 10 items → last batch has 2 valid
    assert real.min() >= -1 and real.max() <= 1
    # center mask: hole in the middle
    assert mask[0, 0, 32, 32] == 0 and mask[0, 0, 1, 1] == 1


def test_formatters_contract():
    ds = SyntheticDataset(resolution=64, length=2)
    for fmt in (RandomMaskFormatter(mask_resolution=64),
                LamaMaskFormatter(resolution=256, type="thin"),):
        real, mask, uid = fmt(ds[0])
        assert real.shape[0] == 3
        assert set(np.unique(mask)).issubset({0.0, 1.0})
        assert isinstance(uid, str)


def test_eval_pipeline_prefetch():
    ds = SyntheticDataset(resolution=32, length=9)
    pipe = EvalPipeline(ds, CenterMaskFormatter(), batch_size=4)
    n_valid = 0
    for real, mask, valid, uids in pipe:
        assert real.shape == (4, 3, 32, 32)
        n_valid += int(valid.sum())
    assert n_valid == 9


# ---------------------------------------------------------------------------
# parallel prefetch: ordering + scheduling-independent determinism
# ---------------------------------------------------------------------------

def test_prefetcher_ordered_parallel():
    from shgan_tpu.data.pipeline import _Prefetcher
    import time

    def make(b):  # jittered completion order
        time.sleep(0.002 * ((b * 7) % 5))
        return b * 10

    got = list(_Prefetcher(make, 12, depth=3, num_threads=4))
    assert got == [b * 10 for b in range(12)]
    # synchronous mode
    assert list(_Prefetcher(make, 5, num_threads=0)) == [0, 10, 20, 30, 40]


def test_datashard_parallel_determinism():
    """Same batches (incl. random masks) for any worker count/scheduling."""
    from shgan_tpu.data.datasets import get_dataset
    from shgan_tpu.data.formatters import get_formatter
    from shgan_tpu.data.sampler import DataShard
    from shgan_tpu.data.pipeline import _Prefetcher

    ds = get_dataset({"type": "synthetic",
                      "args": {"length": 10, "resolution": 32}})
    fmt = get_formatter({"type": "RandomMaskFormatter",
                         "args": {"mask_resolution": 32, "impl": "numpy"}})
    shard = DataShard(ds, fmt, batch_size=3, shuffle=True, seed=7)

    serial = [shard.get_batch(b) for b in range(len(shard))]
    parallel = list(_Prefetcher(shard.get_batch, len(shard), depth=2,
                                num_threads=4))
    for (r1, m1, v1, u1), (r2, m2, v2, u2) in zip(serial, parallel):
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(m1, m2)  # masks too — per-batch RNG
        np.testing.assert_array_equal(v1, v2)
        assert u1 == u2


def test_datashard_epoch_changes_masks():
    from shgan_tpu.data.datasets import get_dataset
    from shgan_tpu.data.formatters import get_formatter
    from shgan_tpu.data.sampler import DataShard

    ds = get_dataset({"type": "synthetic",
                      "args": {"length": 4, "resolution": 32}})
    fmt = get_formatter({"type": "RandomMaskFormatter",
                         "args": {"mask_resolution": 32, "impl": "numpy",
                                  "random_flip": False}})
    a = DataShard(ds, fmt, 4, seed=1, epoch=0).get_batch(0)
    b = DataShard(ds, fmt, 4, seed=1, epoch=1).get_batch(0)
    c = DataShard(ds, fmt, 4, seed=1, epoch=0).get_batch(0)
    assert not np.array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[1], c[1])


def test_device_image_bank_rejects_flipping_formatter():
    """Bank mode discards the formatter's image output, so a flipping
    formatter must be rejected up front (data/pipeline.py) — including
    when wrapped by a transforms pipeline (wrap_formatter propagates
    random_flip)."""
    import pytest
    from shgan_tpu.data.datasets import get_dataset
    from shgan_tpu.data.formatters import get_formatter
    from shgan_tpu.data.pipeline import EvalPipeline
    from shgan_tpu.data.transforms import wrap_formatter

    ds = get_dataset({"type": "synthetic",
                      "args": {"length": 4, "resolution": 16,
                               "as_u8": True, "pool": 2}})
    flip = get_formatter({"type": "RandomMaskFormatter",
                          "args": {"mask_resolution": 16,
                                   "random_flip": True}})
    with pytest.raises(ValueError, match="pixel-preserving"):
        EvalPipeline(ds, flip, batch_size=2, device_image_bank=True)

    wrapped = wrap_formatter(flip, [{"type": "Resize",
                                     "args": {"resolution": 16}}])
    assert wrapped.random_flip is True
    assert wrapped.alters_pixels is True  # ANY transforms → bank invalid
    with pytest.raises(ValueError, match="pixel-preserving"):
        EvalPipeline(ds, wrapped, batch_size=2, device_image_bank=True)

    noflip = get_formatter({"type": "RandomMaskFormatter",
                            "args": {"mask_resolution": 16,
                                     "random_flip": False}})
    pipe = EvalPipeline(ds, noflip, batch_size=2, device_image_bank=True)
    assert pipe.device_bank is not None


def test_dataset_pick_estimators():
    """pick (PickFileEstimator, ds_estimator.py:42-65), pick_repeat, and
    pick_index (PickIndexEstimator, ds_estimator.py:67-85)."""
    from shgan_tpu.data import get_dataset

    base = {"type": "synthetic", "args": {"resolution": 16, "length": 8}}
    ds = get_dataset({**base, "pick": ["syn00002", "syn00005"]})
    assert [i["unique_id"] for i in ds.load_info] == ["syn00002", "syn00005"]

    ds = get_dataset({**base, "pick": ["syn00001"], "pick_repeat": 3})
    assert len(ds) == 3
    assert all(i["unique_id"] == "syn00001" for i in ds.load_info)

    ds = get_dataset({**base, "pick_index": [4, 0, 4]})
    assert [i["unique_id"] for i in ds.load_info] == \
        ["syn00004", "syn00000", "syn00004"]


# ---------------------------------------------------------------------------
# uint8 transport + synthetic pool
# ---------------------------------------------------------------------------

def test_u8_transport_roundtrips_uint8_sourced_images():
    """For images that were uint8 to begin with, u8 transport + the
    device-side u/127.5-1 normalization reproduces the f32 path
    bit-exactly (models/infer.py contract)."""

    class U8DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            u = rng.randint(0, 256, (3, 16, 16), dtype=np.uint8)
            return {"image": u.astype(np.float32) / 255.0,
                    "unique_id": f"u{i}"}

    fmt = CenterMaskFormatter()
    f32 = DataShard(U8DS(), fmt, batch_size=4, transport="f32")
    u8 = DataShard(U8DS(), fmt, batch_size=4, transport="u8")
    r32, m32, _, _ = f32.get_batch(0)
    r8, m8, _, _ = u8.get_batch(0)
    assert r8.dtype == np.uint8 and m8.dtype == np.uint8
    # device-side normalization (f32 arithmetic) reproduces r32 exactly
    back = r8.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_array_equal(back, r32)
    np.testing.assert_array_equal(m8.astype(np.float32), m32)


def test_u8_transport_same_masks_as_f32():
    """Transport must not consume extra RNG draws: per-position masks are
    identical across transports."""
    ds = SyntheticDataset(resolution=32, length=6)
    fmt = RandomMaskFormatter(mask_resolution=32)
    a = DataShard(ds, fmt, batch_size=3, seed=9, transport="f32")
    b = DataShard(ds, fmt, batch_size=3, seed=9, transport="u8")
    for k in range(2):
        _, ma, _, _ = a.get_batch(k)
        _, mb, _, _ = b.get_batch(k)
        np.testing.assert_array_equal(ma, mb.astype(np.float32))


def test_synthetic_pool_serves_distinct_positions():
    ds_pool = SyntheticDataset(resolution=16, length=10, pool=3)
    ds_full = SyntheticDataset(resolution=16, length=10)
    # position i gets image i % pool, with the position's own uid
    np.testing.assert_array_equal(ds_pool[5]["image"], ds_pool[2]["image"])
    np.testing.assert_array_equal(ds_pool[2]["image"], ds_full[2]["image"])
    assert ds_pool[5]["unique_id"] == "syn00005"
    assert len(ds_pool) == 10


def test_eval_pipeline_worker_device_put():
    """Single-process EvalPipeline with a mesh uploads inside the prefetch
    worker; yielded arrays are already device-resident and sharded."""
    import jax
    from shgan_tpu.parallel import create_mesh

    ds = SyntheticDataset(resolution=16, length=8)
    mesh = create_mesh(2)
    pipe = EvalPipeline(ds, CenterMaskFormatter(), batch_size=4, mesh=mesh,
                        transport="u8")
    assert pipe._put_in_worker
    for real, mask, valid, uids in pipe:
        assert isinstance(real, jax.Array) and real.dtype == jnp_uint8()
        assert real.sharding.spec[0] == "data"


def jnp_uint8():
    import jax.numpy as jnp
    return jnp.uint8
