"""Torch-free reader for PyTorch ``.pth`` checkpoints.

The reference release ships generator weights as ``torch.save`` zip archives
(loaded at `/root/reference/lib/experiments/shgan_default.py:224`).  This
reader parses that format with only ``zipfile`` + ``pickle`` + ``numpy`` —
no torch import — so the framework stays standalone.  The zip layout is::

    <name>/data.pkl      pickle stream using persistent IDs
                         ('storage', <StorageType>, key, location, numel)
    <name>/data/<key>    raw little-endian tensor bytes

Tensors are rebuilt by ``torch._utils._rebuild_tensor_v2`` calls inside the
pickle, which we intercept and emulate with numpy strided views.

If the file is a legacy (non-zip) pickle, we fall back to ``torch.load``
when torch is importable.
"""

from __future__ import annotations

import io
import pickle
import zipfile

import numpy as np

_DTYPE_BY_STORAGE = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": "bfloat16",  # resolved lazily via ml_dtypes
}


class _AttrDict(dict):
    """dict that tolerates attribute assignment (OrderedDict._metadata)."""


class _StorageType:
    def __init__(self, name):
        self.name = name

    @property
    def dtype(self):
        d = _DTYPE_BY_STORAGE[self.name]
        if d == "bfloat16":
            import ml_dtypes
            return np.dtype(ml_dtypes.bfloat16)
        return np.dtype(d)


def _rebuild_tensor_v2(storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    # size/stride/offset come from the UNTRUSTED pickle: bound-check them
    # before as_strided, which would otherwise view (and
    # ascontiguousarray would copy) arbitrary process memory
    size, stride = tuple(int(s) for s in size), tuple(int(s) for s in stride)
    if (storage_offset < 0 or storage_offset > storage.size
            or len(size) != len(stride)
            or any(s < 0 for s in size) or any(s < 0 for s in stride)):
        raise ValueError(f"tensor header out of bounds: offset="
                         f"{storage_offset} size={size} stride={stride} "
                         f"storage numel={storage.size}")
    flat = storage[storage_offset:]
    itemsize = flat.dtype.itemsize
    if len(size) == 0:
        if flat.size < 1:
            raise ValueError("scalar tensor beyond end of storage")
        return flat[:1].reshape(())
    if 0 not in size:
        last = sum((s - 1) * st for s, st in zip(size, stride))
        if last >= flat.size:
            raise ValueError(
                f"tensor extent {last + 1} exceeds storage remainder "
                f"{flat.size} (offset={storage_offset} size={size} "
                f"stride={stride})")
    arr = np.lib.stride_tricks.as_strided(
        flat, shape=size, strides=tuple(s * itemsize for s in stride))
    return np.ascontiguousarray(arr)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


# Explicit allowlists for the stdlib/numpy names a tensor checkpoint can
# legitimately reference.  A blanket `builtins` passthrough would hand a
# crafted pickle eval/exec/getattr via REDUCE — side-effect-free
# constructors only.
_SAFE_BUILTINS = frozenset({
    "list", "dict", "tuple", "set", "frozenset", "slice", "complex",
    "bytearray", "range", "int", "float", "bool", "str", "bytes",
})
_SAFE_NUMPY = frozenset({
    "ndarray", "dtype", "scalar", "_reconstruct", "_frombuffer",
})


def safe_stdlib_class(module, name, fallback):
    """Resolve an allowlisted builtins/numpy name, else refuse."""
    if module == "builtins" and name in _SAFE_BUILTINS:
        return fallback(module, name)
    if module in ("numpy", "numpy.core.multiarray",
                  "numpy._core.multiarray") and name in _SAFE_NUMPY:
        return fallback(module, name)
    raise pickle.UnpicklingError(
        f"refusing to unpickle {module}.{name} from checkpoint")


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, zf, prefix):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix
        self._cache = {}

    def find_class(self, module, name):
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch" and name in _DTYPE_BY_STORAGE:
            return _StorageType(name)
        if module == "collections" and name == "OrderedDict":
            # dict subclass so pickle BUILD can attach the state_dict
            # _metadata attribute
            return _AttrDict
        if module == "torch.serialization" and name == "_get_layout":
            return lambda *a, **k: None
        return safe_stdlib_class(module, name, super().find_class)

    def persistent_load(self, pid):
        kind = pid[0]
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        if key in self._cache:
            return self._cache[key]
        dtype = (storage_type.dtype if isinstance(storage_type, _StorageType)
                 else np.dtype(np.float32))
        raw = self._zf.read(f"{self._prefix}data/{key}")
        arr = np.frombuffer(raw, dtype=dtype, count=numel)
        self._cache[key] = arr
        return arr


def load_torch_pth(path):
    """Load a ``.pth`` file into a (possibly nested) dict of numpy arrays."""
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:4] == b"PK\x03\x04":
        with zipfile.ZipFile(path) as zf:
            pkl_names = [n for n in zf.namelist() if n.endswith("data.pkl")]
            if not pkl_names:
                raise ValueError(f"no data.pkl in {path}")
            pkl = pkl_names[0]
            prefix = pkl[: -len("data.pkl")]
            with zf.open(pkl) as f:
                return _Unpickler(io.BytesIO(f.read()), zf, prefix).load()
    # legacy format: fall back to torch if available
    try:
        import torch
    except ImportError as e:
        raise ValueError(
            f"{path} is a legacy torch pickle; torch unavailable") from e
    obj = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in obj.items()}
