"""Transform registry + formatter additions (data/transforms.py,
AdvInpainting/FreeForm formatters)."""

import numpy as np

from shgan_tpu.data.transforms import get_transforms, wrap_formatter
from shgan_tpu.data.formatters import get_formatter


def _el(res=40):
    rng = np.random.RandomState(0)
    return {"image": rng.rand(3, res, res).astype(np.float32),
            "unique_id": "u0"}


def test_resize_center_crop_cast():
    t = get_transforms([
        {"type": "Resize", "args": {"resolution": 32}},
        {"type": "CenterCrop", "args": {"size": 16}},
        {"type": "UniformNumpyType", "args": {"dtype": "float32"}},
    ])
    out = t(_el())
    assert out["image"].shape == (3, 16, 16)
    assert out["image"].dtype == np.float32
    assert out["unique_id"] == "u0"


def test_random_flip_preserves_content():
    el = _el()
    np.random.seed(0)
    t = get_transforms([{"type": "RandomFlip", "args": {"p": 1.0}}])
    out = t(el)
    np.testing.assert_allclose(out["image"], el["image"][:, :, ::-1])


def test_wrap_formatter_composes():
    fmt = get_formatter({"type": "NoMaskFormatter"})
    wrapped = wrap_formatter(fmt, [{"type": "Resize",
                                    "args": {"resolution": 24}}])
    x, mask, uid = wrapped(_el())
    assert x.shape == (3, 24, 24) and mask.shape == (24, 24)
    assert wrap_formatter(fmt, None) is fmt


def test_resize_bicubic_matches_torch():
    """resize_bicubic_float reproduces torch F.interpolate(mode='bicubic',
    align_corners=False) — the reference AdvInpaintingFormatter's resize
    (ds_places2.py:203-205).  A uint8/PIL round trip would quantize and
    use PIL's different (A=-0.5) kernel."""
    import torch
    import torch.nn.functional as F
    from shgan_tpu.data.transforms import resize_bicubic_float

    rng = np.random.RandomState(0)
    for (ih, iw), (oh, ow) in [((30, 44), (57, 50)),   # upsample
                               ((70, 64), (48, 52)),   # downsample
                               ((33, 33), (33, 33))]:  # identity
        x = rng.randn(3, ih, iw).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x)[None], size=(oh, ow),
                             mode="bicubic",
                             align_corners=False)[0].numpy()
        got = resize_bicubic_float(x, oh, ow)
        # residual is torch's own f32 accumulation noise (we sum in f64)
        assert np.abs(got - want).max() < 5e-4, (ih, iw, oh, ow)


def test_u8_fast_path_invalidated_by_transforms():
    """A transform that rewrites el['image'] must invalidate the cached
    uint8 copy — the formatter's u8 fast path would otherwise silently
    discard the transform (data/transforms.py compose)."""
    from shgan_tpu.data.transforms import get_transforms

    img = np.random.RandomState(0).rand(3, 16, 16).astype(np.float32)
    el = {"image": img, "image_u8": (img * 255).astype(np.uint8),
          "unique_id": "x"}
    t = get_transforms([{"type": "RandomFlip", "args": {"p": 1.0}}])
    out = t(dict(el))
    assert "image_u8" not in out          # stale copy dropped
    np.testing.assert_array_equal(out["image"], img[:, :, ::-1])
    # a no-op pipeline keeps the fast path
    t2 = get_transforms([{"type": "Resize", "args": {"resolution": 16}}])
    out2 = t2(dict(el))
    assert "image_u8" in out2


def test_freeform_and_adv_formatters():
    np.random.seed(1)
    fmt = get_formatter({"type": "FreeFormMaskFormatter",
                         "args": {"resolution": 40, "random_flip": False}})
    x, mask, _ = fmt(_el())
    assert x.shape == (3, 40, 40) and mask.shape == (40, 40)
    assert x.min() >= -1.001 and x.max() <= 1.001

    np.random.seed(2)
    fmt = get_formatter({"type": "AdvInpaintingFormatter",
                         "args": {"resolution": 32}})
    x, mask, _ = fmt(_el(48))
    assert x.shape == (3, 32, 32) and mask.shape == (32, 32)
    assert set(np.unique(mask)) <= {0.0, 1.0}
