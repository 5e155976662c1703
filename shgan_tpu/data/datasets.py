"""Datasets: index builders + image loaders (host-side).

References:
  * ``ffhqzip``: reads ``ffhq{256,512}x512.zip`` with split val=[0,10000),
    train=[10000,70000) (`/root/reference/lib/data_factory/ds_ffhq.py:266-305`).
  * ``places2``: directory walk over data_challenge / val_large etc.
    (`/root/reference/lib/data_factory/ds_places2.py:18-77`) with bicubic
    ``FixResolutionLoader`` (`ds_places2.py:91-103`).
  * generic image-dir dataset (`ds_openimages.py` pattern).

A dataset yields dict *elements* ({'image': float32 CHW in [0,1],
'unique_id': str}); a formatter (see .formatters) turns an element into the
(real, mask, uid) training tuple — the reference's loader→transform→
formatter pipeline (`ds_base.py:158-178`) collapsed to two stages.

A ``SyntheticDataset`` is provided for smoke tests/benches when no data root
exists (the reference's --debug pathway shrinks data instead,
`cfg_helper.py:262-290`).
"""

from __future__ import annotations

import os
import os.path as osp
import io
import zipfile

import numpy as np

_DATASET_REGISTRY = {}


def register_dataset(name):
    def wrap(cls):
        _DATASET_REGISTRY[name] = cls
        return cls
    return wrap


_DATASET_CFG_KEYS = ("root_dir", "mode", "resolution", "try_sample",
                     "length", "seed", "allow_partial",
                     "mixed_order_on_texture_type")


def get_dataset(cfg, fallback_synthetic=False):
    """Build a dataset from a config dict.

    Accepts the reference's dataset-bank layout (top-level ``root_dir`` /
    ``mode`` keys, `configs/dataset/ffhq.yaml:68-76`) and/or an ``args``
    dict; unknown orchestration keys (loader/transform/estimator/formatter)
    are handled elsewhere and ignored here.

    With ``fallback_synthetic=True`` (debug/smoke runs — the reference's
    ``--debug`` mode is its de-facto integration test, SURVEY.md §4), a
    missing data root degrades to the deterministic :class:`SyntheticDataset`
    at the configured resolution instead of failing.
    """
    if isinstance(cfg, str):
        return _DATASET_REGISTRY[cfg]()
    typ = cfg["type"]
    args = dict(cfg.get("args") or {})
    for k in _DATASET_CFG_KEYS:
        if cfg.get(k) is not None and k not in args:
            args[k] = cfg[k]
    cache = bool(args.pop("cache", None) or cfg.get("cache"))
    pick = args.pop("pick", None) or cfg.get("pick")
    pick_index = args.pop("pick_index", None) or cfg.get("pick_index")
    pick_repeat = int(args.pop("pick_repeat", None)
                      or cfg.get("pick_repeat") or 1)
    try:
        ds = _DATASET_REGISTRY[typ](**args)
        if pick and hasattr(ds, "load_info"):
            # restrict to given unique_ids, optionally repeated (reference
            # --pick / PickFileEstimator(filelist, repeat_n),
            # ds_estimator.py:42-65)
            keep = set(pick)
            ds.load_info = [i for i in ds.load_info
                            if i["unique_id"] in keep] * pick_repeat
        if pick_index and hasattr(ds, "load_info"):
            # select by dataset position (PickIndexEstimator,
            # ds_estimator.py:67-85)
            ds.load_info = [ds.load_info[i] for i in pick_index]
        return CachedDataset(ds) if cache else ds
    except FileNotFoundError:
        if not fallback_synthetic:
            raise
        res = args.get("resolution")
        if res is None:
            digits = "".join(c for c in str(args.get("mode", ""))
                             if c.isdigit())
            res = int(digits) if digits else 256
        import sys
        print(f"[shgan_tpu.data] data root missing for {typ!r}; using "
              f"synthetic {res}px dataset (debug fallback)", file=sys.stderr)
        ds = SyntheticDataset(resolution=res, length=64,
                              try_sample=args.get("try_sample"))
        gen_dir = args.get("gen_dir") or cfg.get("gen_dir")
        if gen_dir:
            # keep the loadgen pairing in the fallback so a debug
            # --evalnog_path run still exercises the pregen eval path
            ds = LoadGenDataset(ds, gen_dir)
        return ds


def _decode_png(data):
    try:
        import pyspng
        return pyspng.load(data)
    except ImportError:
        from PIL import Image
        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def _to_chw01(img_hwc_uint8):
    img = np.asarray(img_hwc_uint8)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, 2)
    if img.shape[2] > 3:
        img = img[:, :, :3]
    return img.transpose(2, 0, 1).astype(np.float32) / 255.0


class _Base:
    """len/getitem protocol: __getitem__ returns an element dict."""

    load_info: list

    def __len__(self):
        return len(self.load_info)


@register_dataset("ffhqzip")
class FFHQZipDataset(_Base):
    """FFHQ from zip archives; mode ∈ train256/val256/train512/val512
    (ds_ffhq.py:266-305)."""

    SPLITS = {
        "train256": ("ffhq256x256.zip", (10000, 70000)),
        "val256": ("ffhq256x256.zip", (0, 10000)),
        "train512": ("ffhq512x512.zip", (10000, 70000)),
        "val512": ("ffhq512x512.zip", (0, 10000)),
        "train512ori": ("ffhq512x512.zip", (10000, 70000)),
        "val512ori": ("ffhq512x512.zip", (0, 10000)),
    }

    def __init__(self, root_dir, mode="val256", try_sample=None):
        zipname, split = self.SPLITS[mode]
        self.zip_path = osp.join(root_dir, zipname)
        self._zf = None
        info = []
        with zipfile.ZipFile(self.zip_path) as z:
            for fi in z.namelist():
                if ".png" not in fi:
                    continue
                uid = osp.splitext(osp.basename(fi))[0]
                info.append({"unique_id": uid, "image_path": fi})
        info = sorted(info, key=lambda x: x["unique_id"])
        info = info[split[0]: split[1]]
        if try_sample is not None:
            info = info[:try_sample]
        self.load_info = info

    def _zip(self):
        # one handle per worker THREAD (zipfile serializes concurrent reads
        # of a shared handle on an internal lock — per-thread handles let
        # the pipeline's decode workers actually overlap), re-opened lazily
        # after fork
        import threading
        tls = self.__dict__.setdefault("_tls", threading.local())
        if getattr(tls, "zf", None) is None or tls.pid != os.getpid():
            tls.zf = zipfile.ZipFile(self.zip_path)
            tls.pid = os.getpid()
        return tls.zf

    def __getitem__(self, i):
        info = self.load_info[i]
        data = self._zip().read(info["image_path"])
        return {"image": _to_chw01(_decode_png(data)),
                "unique_id": info["unique_id"]}


@register_dataset("places2")
class Places2Dataset(_Base):
    """Places2 directory-walk dataset with bicubic resize to ``resolution``
    (ds_places2.py:18-103)."""

    MODES = {
        "train": "data_challenge",
        "train_large": "data_large",
        "val": "val_large",
        "val_large": "val_large",
        "test": "test_large",
    }

    def __init__(self, root_dir, mode="val_large", resolution=256,
                 try_sample=None):
        subdir = self.MODES.get(mode, mode)
        base = osp.join(root_dir, subdir)
        if not osp.isdir(base):
            # raise like every sibling dataset: get_dataset's documented
            # missing-root handling (synthetic debug fallback) keys on
            # FileNotFoundError — os.walk on a missing path would
            # silently yield a 0-length dataset instead
            raise FileNotFoundError(f"places2 root not found: {base}")
        info = []
        for dirpath, _dirnames, filenames in sorted(os.walk(base)):
            for fn in sorted(filenames):
                if osp.splitext(fn)[1].lower() not in (".jpg", ".jpeg",
                                                       ".png"):
                    continue
                path = osp.join(dirpath, fn)
                uid = osp.splitext(osp.relpath(path, base))[0].replace(
                    "/", "_")
                info.append({"unique_id": uid, "image_path": path})
        info = sorted(info, key=lambda x: x["unique_id"])
        if try_sample is not None:
            info = info[:try_sample]
        self.load_info = info
        self.resolution = resolution

    def __getitem__(self, i):
        from PIL import Image
        info = self.load_info[i]
        img = Image.open(info["image_path"]).convert("RGB")
        if img.size != (self.resolution, self.resolution):
            img = img.resize((self.resolution, self.resolution),
                             Image.BICUBIC)
        return {"image": _to_chw01(np.asarray(img)),
                "unique_id": info["unique_id"]}


@register_dataset("imagedir")
class ImageDirDataset(_Base):
    """Flat/recursive image directory (generic fallback pattern)."""

    def __init__(self, root_dir, resolution=None, try_sample=None):
        if not osp.isdir(root_dir):
            raise FileNotFoundError(f"image dir not found: {root_dir}")
        info = []
        for dirpath, _d, filenames in sorted(os.walk(root_dir)):
            for fn in sorted(filenames):
                if osp.splitext(fn)[1].lower() not in (".jpg", ".jpeg",
                                                       ".png", ".webp"):
                    continue
                path = osp.join(dirpath, fn)
                uid = osp.splitext(osp.relpath(path, root_dir))[0].replace(
                    "/", "_")
                info.append({"unique_id": uid, "image_path": path})
        if try_sample is not None:
            info = info[:try_sample]
        self.load_info = info
        self.resolution = resolution

    def __getitem__(self, i):
        from PIL import Image
        info = self.load_info[i]
        img = Image.open(info["image_path"]).convert("RGB")
        if self.resolution and img.size != (self.resolution,
                                            self.resolution):
            img = img.resize((self.resolution, self.resolution),
                             Image.BICUBIC)
        return {"image": _to_chw01(np.asarray(img)),
                "unique_id": info["unique_id"]}


@register_dataset("ffhq")
class FFHQJsonDataset(_Base):
    """FFHQ via the official ``ffhq-dataset-v2.json`` index
    (`/root/reference/lib/data_factory/ds_ffhq.py:19-66`): mode is a
    '+'-joined subset of train/val mapping to the json 'category'
    (training/validation); unique ids are '00_train-<stem>' /
    '50_val-<stem>' so a sorted order puts train before val.
    ``allow_partial`` skips missing files (debug subsets); otherwise a
    missing file is an error.  ``resolution`` adds the bicubic R512Loader
    behavior (ds_ffhq.py:101-112)."""

    _CATEGORY = {"train": "training", "val": "validation"}
    _MODETAG = {"training": "00_train", "validation": "50_val"}

    def __init__(self, root_dir, mode="train", allow_partial=False,
                 resolution=None, try_sample=None):
        import json
        index = osp.join(root_dir, "ffhq-dataset-v2.json")
        if not osp.isfile(index):
            raise FileNotFoundError(index)
        with open(index) as f:
            jinfo = json.load(f)
        subset = {self._CATEGORY.get(m) for m in str(mode).split("+")}
        info = []
        for _, ji in jinfo.items():
            if ji["category"] not in subset:
                continue
            impath = osp.join(root_dir, ji["image"]["file_path"])
            if not impath.endswith((".jpg", ".png")):
                continue
            if not osp.isfile(impath):
                if allow_partial:
                    continue
                raise ValueError(f"missing image {impath}")
            stem = osp.splitext(osp.basename(impath))[0]
            uid = f"{self._MODETAG[ji['category']]}-{stem}"
            info.append({"unique_id": uid, "image_path": impath})
        if try_sample is not None:
            info = info[:try_sample]
        self.load_info = info
        self.resolution = resolution

    def __getitem__(self, i):
        from PIL import Image
        info = self.load_info[i]
        img = Image.open(info["image_path"]).convert("RGB")
        if self.resolution and img.size != (self.resolution,
                                            self.resolution):
            img = img.resize((self.resolution, self.resolution),
                             Image.BICUBIC)
        return {"image": _to_chw01(np.asarray(img)),
                "unique_id": info["unique_id"]}


@register_dataset("ffhqsimple")
class FFHQSimpleDataset(_Base):
    """FFHQ from the extracted ``ffhq256x256/<sub>/<id>.png`` folder tree
    (ds_ffhq.py:222-244; mode train256 only there)."""

    def __init__(self, root_dir, mode="train256", try_sample=None):
        if mode != "train256":
            raise ValueError(f"ffhqsimple supports mode train256, got "
                             f"{mode!r} (ds_ffhq.py:227-231)")
        base = osp.join(root_dir, "ffhq256x256")
        if not osp.isdir(base):
            raise FileNotFoundError(base)
        info = []
        for sub in sorted(os.listdir(base)):
            subdir = osp.join(base, sub)
            if not osp.isdir(subdir):
                continue
            for fn in sorted(os.listdir(subdir)):
                if not fn.endswith(".png"):
                    continue
                info.append({"unique_id": osp.splitext(fn)[0],
                             "image_path": osp.join(subdir, fn)})
        if try_sample is not None:
            info = info[:try_sample]
        self.load_info = info

    def __getitem__(self, i):
        from PIL import Image
        info = self.load_info[i]
        img = Image.open(info["image_path"]).convert("RGB")
        return {"image": _to_chw01(np.asarray(img)),
                "unique_id": info["unique_id"]}


def _fit_resolution(img, resolution):
    """The openimages FixResolutionLoader (ds_openimages.py:64-80):
    aspect-preserving bicubic downscale so the long side fits, zero-pad to
    a square, and record the pre-pad content size (h, w) — the
    FreeFormMaskFormatter masks the padding out (ds_openimages.py:163-165).
    """
    from PIL import Image
    w, h = img.size
    if w > resolution or h > resolution:
        ratio = resolution / w if w > h else resolution / h
        target = ((resolution, int(h * ratio)) if w > h
                  else (int(w * ratio), resolution))
        img = img.resize(target, Image.BICUBIC)
    content_size = (img.size[1], img.size[0])  # (h, w)
    padded = np.zeros((resolution, resolution, 3), np.uint8)
    arr = np.asarray(img, np.uint8)
    padded[: arr.shape[0], : arr.shape[1]] = arr
    return padded, content_size


@register_dataset("openimages")
class OpenImagesDataset(_Base):
    """OpenImagesV6 (ds_openimages.py:22-50): mode train → <root>/train,
    val → <root>/validation; unique id joins the subdirectory tags with the
    file stem.  Images load through the aspect-preserving pad-to-square
    FixResolutionLoader with ``content_size`` recorded per element."""

    MODES = {"train": "train", "val": "validation"}

    def __init__(self, root_dir, mode="val", resolution=512,
                 try_sample=None):
        if mode not in self.MODES:
            raise ValueError(f"openimages mode must be train|val, got "
                             f"{mode!r}")
        base = osp.join(root_dir, self.MODES[mode])
        if not osp.isdir(base):
            raise FileNotFoundError(base)
        info = []
        for dirpath, _d, filenames in sorted(os.walk(base)):
            for fn in sorted(filenames):
                path = osp.join(dirpath, fn)
                if not path.endswith((".jpg", ".png")):
                    continue
                rel = osp.relpath(dirpath, base)
                tags = ([] if rel == "." else rel.split(os.sep)) \
                    + [osp.splitext(fn)[0]]
                info.append({"unique_id": "-".join(tags),
                             "image_path": path})
        if try_sample is not None:
            info = info[:try_sample]
        self.load_info = info
        self.resolution = resolution

    def __getitem__(self, i):
        from PIL import Image
        info = self.load_info[i]
        img = Image.open(info["image_path"]).convert("RGB")
        padded, content_size = _fit_resolution(img, self.resolution)
        return {"image": _to_chw01(padded),
                "content_size": content_size,
                "unique_id": info["unique_id"]}


@register_dataset("texture")
class TextureDataset(_Base):
    """DTD texture dataset (ds_texture.py:23-88): file lists from
    ``<root>/dtd/labels/<mode>.txt`` ('+'-joinable, e.g. train1+val1),
    images at ``<root>/dtd/images/<type>/<file>``, square bicubic resize.
    ``mixed_order_on_texture_type`` round-robins the texture types so demo
    grids cover many patterns (ds_texture.py:66-88), prefixing uids with a
    running counter exactly like the reference."""

    def __init__(self, root_dir, mode="train1", resolution=512,
                 mixed_order_on_texture_type=False, try_sample=None):
        labels = osp.join(root_dir, "dtd", "labels")
        if not osp.isdir(labels):
            raise FileNotFoundError(labels)
        imlist = []
        for m in str(mode).split("+"):
            if not m.startswith(("train", "val", "test")):
                raise ValueError(f"texture mode part {m!r}")
            with open(osp.join(labels, m + ".txt")) as f:
                imlist += [li.strip() for li in f if li.strip()]
        info = []
        for imref in imlist:
            ttype, filename = osp.split(imref)
            info.append({
                "unique_id": osp.splitext(filename)[0],
                "texture_type": ttype,
                "image_path": osp.join(root_dir, "dtd", "images", ttype,
                                       filename)})
        if mixed_order_on_texture_type:
            groups = {}
            for el in info:
                groups.setdefault(el["texture_type"], []).append(el)
            info, cnt = [], 0
            while groups:
                for tt in list(groups):
                    if not groups[tt]:
                        groups.pop(tt)
                        continue
                    el = dict(groups[tt].pop(0))
                    el["unique_id"] = "{:05d}_".format(cnt) + el["unique_id"]
                    info.append(el)
                    cnt += 1
        if try_sample is not None:
            info = info[:try_sample]
        self.load_info = info
        self.resolution = resolution

    def __getitem__(self, i):
        from PIL import Image
        info = self.load_info[i]
        img = Image.open(info["image_path"]).convert("RGB")
        if self.resolution and img.size != (self.resolution,
                                            self.resolution):
            img = img.resize((self.resolution, self.resolution),
                             Image.BICUBIC)
        return {"image": _to_chw01(np.asarray(img)),
                "unique_id": info["unique_id"]}


class CachedDataset(_Base):
    """In-memory element cache.

    The reference's ``--dscache`` fills a *shared-memory* cross-process
    cache with a rank-sharded loop + barrier (`ds_base.py:96-156`) because
    its loader workers are processes; this pipeline's workers are threads
    of the single controller, so a plain dict is already shared — the
    whole machinery reduces to memoization.
    """

    def __init__(self, base):
        self.base = base
        self._cache = {}

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        if i not in self._cache:
            self._cache[i] = self.base[i]
        return self._cache[i]


@register_dataset("loadgen")
class LoadGenDataset(_Base):
    """Pairs a base dataset's reals with pre-generated images from
    ``gen_dir`` — metric evaluation without running the generator
    (reference ``ffhqzip_loadgen``/``DoubleLoader``, `ds_ffhq.py:388-456`,
    and ``places2_loadgen``, `ds_places2.py:237-288`; CLI
    ``--evalnog_path``)."""

    def __init__(self, base, gen_dir, exts=(".png", ".jpg", ".jpeg")):
        self.base = get_dataset(base) if isinstance(base, dict) else base
        self.gen_dir = gen_dir
        self.exts = exts

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        from PIL import Image
        el = self.base[i]
        uid = el["unique_id"]
        for ext in self.exts:
            p = osp.join(self.gen_dir, uid + ext)
            if osp.isfile(p):
                break
        else:
            raise FileNotFoundError(
                f"no generated image for {uid!r} in {self.gen_dir}")
        gen = Image.open(p).convert("RGB")
        el["gen"] = _to_chw01(np.asarray(gen))
        return el


@register_dataset("ffhqzip_loadgen")
class FFHQZipLoadGen(LoadGenDataset):
    def __init__(self, root_dir, gen_dir, mode="val256", try_sample=None):
        super().__init__(FFHQZipDataset(root_dir, mode, try_sample), gen_dir)


@register_dataset("places2_loadgen")
class Places2LoadGen(LoadGenDataset):
    def __init__(self, root_dir, gen_dir, mode="val", resolution=256,
                 try_sample=None):
        super().__init__(
            Places2Dataset(root_dir, mode=mode, resolution=resolution,
                           try_sample=try_sample), gen_dir)


@register_dataset("synthetic")
class SyntheticDataset(_Base):
    """Deterministic procedural images for tests/benches (no data root).

    ``pool=K`` generates only K distinct images (cached after first use)
    and serves position ``i`` the image ``i % K`` — the image-synthesis
    cost drops out of throughput benches while positions keep distinct
    uids/masks/latents (the host cost being measured is the *pipeline*,
    not this stand-in for a PNG decoder)."""

    def __init__(self, resolution=256, length=64, seed=0, try_sample=None,
                 pool=None, as_u8=False):
        self.resolution = resolution
        self.seed = seed
        self.pool = pool
        self.as_u8 = as_u8  # also carry an ``image_u8`` per element — the
        # formatters' uint8 fast path then skips all host float math
        self._pool_cache = {}
        if try_sample is not None:
            length = min(length, try_sample)
        self.load_info = [{"unique_id": f"syn{i:05d}"} for i in range(length)]

    def _gen(self, i):
        rng = np.random.RandomState(self.seed * 100003 + i)
        res = self.resolution
        # smooth random gradients, cheap but non-trivial
        y = np.linspace(0, 1, res, dtype=np.float32)
        base = rng.rand(3, 1, 1).astype(np.float32)
        img = (base + 0.5 * np.outer(y, y)[None]
               + 0.1 * rng.randn(3, res, res).astype(np.float32))
        return np.clip(img, 0, 1)

    def __getitem__(self, i):
        if self.pool:
            j = int(i) % self.pool
            el = self._pool_cache.get(j)
            if el is None:
                # idempotent under concurrent prefetch threads (worst case
                # two threads generate the same image once)
                el = self._element(j)
                self._pool_cache[j] = el
        else:
            el = self._element(i)
        return dict(el, unique_id=self.load_info[i]["unique_id"])

    def _element(self, i):
        img = self._gen(i)
        el = {"image": img}
        if self.as_u8:
            el["image_u8"] = np.rint(img * 255).clip(0, 255).astype(np.uint8)
        return el

    def image_bank(self):
        """(bank_u8 [K,3,H,W], idx_map [len]) for the device-resident
        image cache (data/pipeline.py device_image_bank) — pooled datasets
        bank only their K distinct images."""
        k = self.pool or len(self)
        bank = np.stack([
            np.rint(self._gen(j) * 255).clip(0, 255).astype(np.uint8)
            for j in range(k)])
        idx_map = np.arange(len(self), dtype=np.int32) % k
        return bank, idx_map
