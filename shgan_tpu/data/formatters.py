"""Formatters: element dict → (real [-1,1] CHW, mask HW {0=hole,1=keep}, uid).

This is the sample tuple contract used everywhere in the reference
(`/root/reference/lib/data_factory/ds_ffhq.py:330-345`); the network input is
later assembled as ``x = cat([mask-0.5, real*mask])``
(`shgan_default.py:274`).
"""

from __future__ import annotations

import numpy as np

from .rng import R as _R

from .masks import random_mask, lama_generator

_FORMATTER_REGISTRY = {}


def register_formatter(name):
    def wrap(cls):
        _FORMATTER_REGISTRY[name] = cls
        return cls
    return wrap


def get_formatter(cfg):
    if isinstance(cfg, str):
        return _FORMATTER_REGISTRY[cfg]()
    typ = cfg["type"]
    return _FORMATTER_REGISTRY[typ](**dict(cfg.get("args") or {}))


@register_formatter("RandomMaskFormatter")
class RandomMaskFormatter:
    """CoModGAN freeform masks (ds_ffhq.py:330-345) — the eval protocol
    behind the published metrics."""

    def __init__(self, random_flip=True, mask_resolution=256,
                 hole_range=(0, 1), impl="auto"):
        self.random_flip = random_flip
        self.mask_resolution = mask_resolution
        self.hole_range = tuple(hole_range)
        self.impl = impl
        self._native = None
        if impl != "numpy":
            from ..native.maskgen import native_available
            self._native = native_available() or None
            if impl == "native" and not self._native:
                from ..native.maskgen import _LIB_ERR
                raise RuntimeError(
                    f"impl='native' requires the C++ maskgen but it is "
                    f"unavailable ({_LIB_ERR}); use impl='auto' for a "
                    "silent numpy fallback")

    def __call__(self, element):
        u8 = element.get("image_u8") if isinstance(element, dict) else None
        if u8 is not None:
            # uint8 fast path: the image crosses the host untouched (flip
            # is a view); normalization to [-1,1] happens on device
            # (models/infer.py) with bit-identical values — the host's
            # float passes were the eval pipeline's largest cost on
            # few-core hosts
            x = u8
            if self.random_flip and _R.rand() < 0.5:
                x = x[:, :, ::-1]
        else:
            x = element["image"] * 2 - 1
            if self.random_flip and _R.rand() < 0.5:
                x = x[:, :, ::-1].copy()
        if self._native:
            # C++ batch generator (shgan_tpu/native/src/maskgen.cpp), seeded
            # from the formatter RNG stream to stay reproducible.
            from ..native.maskgen import random_mask_batch
            seed = int(_R.randint(0, 2 ** 31 - 1))
            mask = random_mask_batch(1, self.mask_resolution,
                                     self.hole_range, seed=seed,
                                     num_threads=1)[0, 0]
        else:
            mask = random_mask(self.mask_resolution, self.hole_range)[0]
        return x, mask, element["unique_id"]


@register_formatter("LamaMaskFormatter")
class LamaMaskFormatter:
    """LaMa-style masks (ds_ffhq.py:351-381); generator output is inverted
    to the 1=keep convention."""

    def __init__(self, random_flip=True, resolution=256, type="thin"):
        self.mask_maker = lama_generator(type, resolution)
        self.random_flip = random_flip

    def __call__(self, element):
        x = element["image"] * 2 - 1
        if self.random_flip and _R.rand() < 0.5:
            x = x[:, :, ::-1].copy()
        mask = self.mask_maker(x)
        mask = 1 - mask[0]
        return x, mask.astype(np.float32), element["unique_id"]


@register_formatter("FreeFormMaskFormatter")
class FreeFormMaskFormatter(RandomMaskFormatter):
    """Places2 freeform-mask variant — same recipe, 'resolution' arg name
    (reference FreeFormMaskFormatter, ds_places2.py:213-229).  When the
    element carries ``content_size`` (openimages pad-to-square loader),
    the padding region is forced to keep=1 so it is never inpainted
    (ds_openimages.py:152-168)."""

    def __init__(self, random_flip=True, resolution=512, hole_range=(0, 1),
                 impl="auto"):
        super().__init__(random_flip=random_flip, mask_resolution=resolution,
                         hole_range=hole_range, impl=impl)

    def __call__(self, element):
        x, mask, uid = super().__call__(element)
        cs = element.get("content_size") if isinstance(element, dict) \
            else None
        if cs is not None:
            im_h, im_w = cs
            mask = np.asarray(mask)
            mask[:, im_w:] = 1.0
            mask[im_h:, :] = 1.0
        return x, mask, uid


@register_formatter("AdvInpaintingFormatter")
class AdvInpaintingFormatter:
    """Random scale ([1, ≥1.2]× bicubic) + random crop augmentation + a
    freeform mask (reference AdvInpaintingFormatter,
    ds_places2.py:183-207) — the Places2 training formatter."""

    def __init__(self, resolution=512, hole_range=(0, 1), impl="auto"):
        self.resolution = resolution
        self._mask = RandomMaskFormatter(random_flip=False,
                                         mask_resolution=resolution,
                                         hole_range=hole_range, impl=impl)

    # pixel-altering augmentation: device_image_bank mode (which serves
    # raw dataset rows and discards formatter pixels) must reject it
    alters_pixels = True

    def __call__(self, element):
        from .transforms import resize_bicubic_float
        x = element["image"]                       # CHW in [0, 1]
        _, oh, ow = x.shape
        s = self.resolution
        nh = _R.randint(s, max(oh, int(s * 1.2)) + 1)
        nw = _R.randint(s, max(ow, int(s * 1.2)) + 1)
        ch = _R.randint(0, nh - s + 1)
        cw = _R.randint(0, nw - s + 1)
        # reference order and precision (ds_places2.py:196-205): normalize
        # to [-1,1] FIRST, then float torch-kernel bicubic (overshoot
        # preserved, no uint8 quantization), then crop
        x = (x - 0.5) * 2
        x = resize_bicubic_float(x, nh, nw)
        x = x[:, ch:ch + s, cw:cw + s]
        _, mask, _ = self._mask({"image": (x + 1) / 2,
                                 "unique_id": element["unique_id"]})
        return x.astype(np.float32), mask, element["unique_id"]


@register_formatter("CenterMaskFormatter")
class CenterMaskFormatter:
    """Center-square hole (reference CenterMaskFormatter,
    ds_ffhq.py:125-140)."""

    def __call__(self, element):
        x = (element["image"] - 0.5) * 2
        _, h, w = x.shape
        mask = np.ones([h, w], np.float32)
        mask[h // 4: h // 4 + h // 2, w // 4: w // 4 + w // 2] = 0
        return x, mask, element["unique_id"]


@register_formatter("FixedMaskFormatter")
class FixedMaskFormatter:
    """Load masks from files next to the images (the reference's
    FixedMaskFormatter pattern for paired eval sets)."""

    def __init__(self, mask_dir, suffix="_mask.png"):
        self.mask_dir = mask_dir
        self.suffix = suffix

    def __call__(self, element):
        from PIL import Image
        import os.path as osp
        x = element["image"] * 2 - 1
        p = osp.join(self.mask_dir, element["unique_id"] + self.suffix)
        # threshold like the reference (mask > 128) — PIL's convert("1")
        # would Floyd-Steinberg DITHER anti-aliased mask edges into
        # speckle instead of a clean boundary
        m = (np.asarray(Image.open(p).convert("L")) > 128) \
            .astype(np.float32)
        return x, m, element["unique_id"]


@register_formatter("NoMaskFormatter")
class NoMaskFormatter:
    """All-keep mask (reference NoMaskFormatter)."""

    def __call__(self, element):
        x = element["image"] * 2 - 1
        _, h, w = x.shape
        return x, np.ones([h, w], np.float32), element["unique_id"]
