"""Torch-free loader for reference training snapshots.

The reference's train stage checkpoints ``network-snapshot-{kimg}.pkl``:
a plain ``pickle.dump`` of ``{'G': <nn.Module>, 'D': <nn.Module>,
'G_ema': <nn.Module>, 'augment_pipe': None}`` — whole torch modules, not
state_dicts (`/root/reference/lib/experiments/stylegan_default.py:506-532`).
Its eval stage also ingests legacy TensorFlow CoModGAN pickles (a tuple of
``dnnlib.tflib.network.Network`` stubs, `stylegan_default.py:591-626`).

This module parses both with only ``pickle`` + ``numpy``:

* torch module classes are replaced by inert attribute-bag stubs; after
  unpickling we walk ``_parameters`` / ``_buffers`` / ``_modules`` (skipping
  ``_non_persistent_buffers_set``, i.e. exactly ``nn.Module.state_dict``
  semantics) to produce flat ``{name: ndarray}`` state_dicts.
* tensors inside a plain pickle serialize their storage via
  ``torch.storage._load_from_bytes(blob)`` where ``blob`` is a legacy
  torch.save stream: magic / protocol / sys_info pickles, the storage
  object (a persistent id ``('storage', type, key, location, numel, ...)``),
  the key list, then per key ``int64 numel`` + raw little-endian bytes.
* ``dnnlib.tflib.network.Network`` stubs expose ``version`` / ``variables``
  / ``components``; we collect variables recursively into ``{path: array}``
  exactly like the reference's ``collect_tf_params`` (with the same
  version-≥4 check).  The reference ships no TF→torch key remap, so neither
  do we — callers get the raw TF parameter dict.

Anything outside the allowlist (torch rebuild helpers, torch.nn / reference
model-zoo classes, OrderedDict, and an explicit set of side-effect-free
numpy/builtins constructors) refuses to unpickle; the framing pickles of
legacy storage streams admit primitives only.
"""

from __future__ import annotations

import io
import pickle
import struct

import numpy as np

from .torch_reader import (_DTYPE_BY_STORAGE, _AttrDict, _StorageType,
                           _rebuild_tensor_v2, _rebuild_parameter,
                           safe_stdlib_class)


class _PrimitiveUnpickler(pickle.Unpickler):
    """For the framing pickles of a legacy storage stream (magic number,
    protocol, sys_info, key list): primitives only, no classes at all."""

    def find_class(self, module, name):
        raise pickle.UnpicklingError(
            f"refusing {module}.{name} in legacy-storage framing")


def _load_primitive(f):
    return _PrimitiveUnpickler(f).load()

_STUB_PREFIXES = ("torch.nn.", "torch.optim.", "lib.", "easydict")


class _ModuleStub:
    """Inert stand-in for a pickled torch module: BUILD fills __dict__."""

    _origin = None  # (module, name) the stub replaced


class _TFNetworkStub(_ModuleStub):
    pass


_stub_cache = {}


def _stub_class(module, name):
    key = (module, name)
    if key not in _stub_cache:
        _stub_cache[key] = type(name, (_ModuleStub,),
                                {"_origin": key, "__module__": module})
    return _stub_cache[key]


def _storage_from_bytes(blob):
    """Parse the legacy torch.save stream embedded by Tensor.__reduce_ex__
    (torch.storage._load_from_bytes) into a flat numpy array."""
    f = io.BytesIO(bytes(blob))
    magic = _load_primitive(f)
    if magic != 0x1950A86A20F9469CFC6C:
        raise pickle.UnpicklingError("bad legacy-storage magic number")
    _load_primitive(f)  # protocol_version
    _load_primitive(f)  # sys_info
    spec = {}

    class _P(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "torch" and name in _DTYPE_BY_STORAGE:
                return _StorageType(name)
            raise pickle.UnpicklingError(
                f"refusing {module}.{name} in legacy storage")

        def persistent_load(self, pid):
            if pid[0] != "storage":
                raise pickle.UnpicklingError(f"unknown pid {pid!r}")
            storage_type, key, _loc, numel = pid[1], pid[2], pid[3], pid[4]
            spec["dtype"] = storage_type.dtype
            spec["key"] = str(key)
            spec["numel"] = int(numel)
            return spec

    obj = _P(f).load()
    if obj is not spec:
        raise pickle.UnpicklingError("legacy storage stream: unexpected obj")
    keys = _load_primitive(f)
    arrays = {}
    for key in keys:
        (numel,) = struct.unpack("<q", f.read(8))
        if str(key) != spec["key"]:
            # the itemsize of a foreign key is unknown (only the target's
            # dtype was declared via persistent_load) — guessing would
            # misalign the stream and silently corrupt every later key.
            # Tensor.__reduce_ex__ emits single-storage blobs; refuse the
            # rest rather than guess.
            raise pickle.UnpicklingError(
                f"legacy storage stream carries unexpected key {key!r} "
                f"(expected only {spec['key']!r}) — cannot size its "
                "payload safely")
        dt = spec["dtype"]
        arrays[str(key)] = np.frombuffer(
            f.read(numel * dt.itemsize), dtype=dt, count=numel)
    return arrays[spec["key"]]


class _SnapshotUnpickler(pickle.Unpickler):
    stub_prefixes = _STUB_PREFIXES

    def find_class(self, module, name):
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch.storage" and name == "_load_from_bytes":
            return _storage_from_bytes
        if module == "torch" and name in _DTYPE_BY_STORAGE:
            return _StorageType(name)
        if module == "torch" and name == "Size":
            return tuple
        if module == "collections" and name == "OrderedDict":
            return _AttrDict
        if module == "dnnlib.tflib.network" and name == "Network":
            return _TFNetworkStub
        if module.startswith(tuple(self.stub_prefixes)):
            return _stub_class(module, name)
        return safe_stdlib_class(module, name, super().find_class)


def _module_state_dict(stub, prefix=""):
    """nn.Module.state_dict() semantics over an unpickled module stub."""
    out = {}
    d = stub.__dict__
    for k, v in (d.get("_parameters") or {}).items():
        if v is not None:
            out[prefix + k] = np.asarray(v)
    skip = d.get("_non_persistent_buffers_set") or set()
    for k, v in (d.get("_buffers") or {}).items():
        if v is not None and k not in skip:
            out[prefix + k] = np.asarray(v)
    for k, v in (d.get("_modules") or {}).items():
        if v is not None:
            out.update(_module_state_dict(v, prefix + k + "."))
    return out


def _collect_tf_params(net, prefix=""):
    """Reference collect_tf_params (stylegan_default.py:603-612)."""
    out = {}
    for name, value in net.__dict__.get("variables", []):
        out[prefix + name] = np.asarray(value)
    for name, comp in (net.__dict__.get("components") or {}).items():
        out.update(_collect_tf_params(comp, prefix + name + "/"))
    return out


def load_network_snapshot(path, extra_stub_prefixes=()):
    """Load a reference ``network-snapshot-*.pkl``.

    Returns ``(data, is_tensorflow)`` mirroring the reference's
    ``load_network_pkl``:

    * torch snapshot → ``data`` is ``{'G': flat_sd, 'D': flat_sd,
      'G_ema': flat_sd, 'augment_pipe': None}`` with flat torch-style
      state_dicts ready for ``torch_state_dict_to_params``.
    * legacy TF pickle (tuple of Networks ``(G, D, Gs)``) → ``data`` maps
      the same keys to raw ``{tf_var_path: array}`` dicts (Gs → 'G_ema').

    ``extra_stub_prefixes`` widens the module-class allowlist (e.g. for
    snapshots written by a vendored copy of the model zoo under a
    different package name).
    """
    with open(path, "rb") as f:
        up = _SnapshotUnpickler(f)
        up.stub_prefixes = _STUB_PREFIXES + tuple(extra_stub_prefixes)
        obj = up.load()

    if isinstance(obj, tuple) and obj and all(
            isinstance(n, _TFNetworkStub) for n in obj):
        for n in obj:
            if n.__dict__.get("version", 0) < 4:
                raise ValueError("TensorFlow pickle version too low")
        names = ["G", "D", "G_ema"]
        data = {name: _collect_tf_params(net)
                for name, net in zip(names, obj)}
        return data, True

    if not isinstance(obj, dict):
        raise ValueError(
            f"unrecognized snapshot payload: {type(obj).__name__}")
    data = {}
    for name, val in obj.items():
        if val is None:
            data[name] = None
        elif isinstance(val, _ModuleStub):
            data[name] = _module_state_dict(val)
        else:
            data[name] = np.asarray(val)
    return data, False


# ---------------------------------------------------------------------------
# legacy TF CoModGAN name remap
# ---------------------------------------------------------------------------

def _tf_conv_w(v):
    """TF conv weight [kh, kw, in, out] → torch OIHW."""
    return np.ascontiguousarray(np.asarray(v).transpose(3, 2, 0, 1))


def _tf_dense_w(v):
    """TF dense weight [in, out] → torch [out, in]."""
    return np.ascontiguousarray(np.asarray(v).T)


def _tf_layer_entries(tf_params, tf_scope, torch_prefix, out):
    """Map one TF conv/modconv/dense layer scope to torch names.

    Layouts: ``weight`` transposes by rank; ``mod_weight/mod_bias`` become
    the style ``affine`` (TF folds the +1 style-bias init into runtime —
    torch stores it in the parameter, hence the +1, cf. bias_init=1 at
    `/root/reference/lib/model_zoo/stylegan.py:266,323`);
    ``noise_strength`` stays scalar."""
    hits = 0
    for suffix, value in list(tf_params.items()):
        if not suffix.startswith(tf_scope + "/"):
            continue
        leaf = suffix[len(tf_scope) + 1:]
        if "/" in leaf:
            continue
        v = np.asarray(value)
        if leaf == "weight":
            out[f"{torch_prefix}.weight"] = (_tf_conv_w(v) if v.ndim == 4
                                             else _tf_dense_w(v))
        elif leaf == "bias":
            out[f"{torch_prefix}.bias"] = v
        elif leaf == "mod_weight":
            out[f"{torch_prefix}.affine.weight"] = _tf_dense_w(v)
        elif leaf == "mod_bias":
            out[f"{torch_prefix}.affine.bias"] = v + 1.0
        elif leaf == "noise_strength":
            out[f"{torch_prefix}.noise_strength"] = v.reshape(())
        else:
            continue
        hits += 1
    return hits


def tf_params_to_torch_state_dict(tf_params):
    """Translate collected legacy-TF CoModGAN generator variables
    (``{tf/slash/path: array}`` from :func:`load_network_snapshot`) into
    reference-torch state_dict names, ready for
    ``torch_state_dict_to_params`` + a non-strict merge (warm start).

    The reference carries the legacy unpickler but no name remap
    (`stylegan_default.py:591-626` — its TF path dead-ends in
    ``copy_params_and_buffers`` with slash names); this table closes that.
    Scope layout follows the public co-mod-gan TF release (StyleGAN2 TF
    conventions): ``mapping/Dense{i}``, ``dlatent_avg``,
    ``synthesis/{r}x{r}/{Conv0_up,Conv1,ToRGB}``, ``synthesis/4x4/
    {Const,Dense0,Conv}``, ``synthesis/noise{i}``, and encoder scopes
    ``[synthesis/]E_{r}x{r}/{FromRGB,Conv0,Conv1_down}`` +
    ``E_4x4/{Conv,Dense0,Dense1}``.  SHU parameters do not exist in TF
    pickles (SH-GAN was torch-native) — they stay at init under the
    non-strict merge.

    Returns ``(state_dict, unmatched_tf_keys)``.
    """
    import re

    out = {}
    consumed_scopes = set()

    def layer(tf_scope, torch_prefix):
        if _tf_layer_entries(tf_params, tf_scope, torch_prefix, out):
            consumed_scopes.add(tf_scope)

    # mapping network + w_avg
    for key in tf_params:
        m = re.fullmatch(r"(?:mapping/)?Dense(\d+)/weight", key)
        if m:
            scope = key[:-len("/weight")]
            layer(scope, f"mapping.fc{m.group(1)}")
    if "dlatent_avg" in tf_params:
        out["mapping.w_avg"] = np.asarray(tf_params["dlatent_avg"])
        consumed_scopes.add("dlatent_avg")

    # synthesis pyramid
    syn = "synthesis/"
    resolutions = sorted({
        int(m.group(1)) for k in tf_params
        for m in [re.match(r"synthesis/(\d+)x\1/", k)] if m})
    for r in resolutions:
        sc = f"{syn}{r}x{r}"
        if r == 4:
            const = tf_params.get(f"{sc}/Const/const")
            if const is not None:
                c = np.asarray(const)
                out["synthesis.b4.const"] = c[0] if (c.ndim == 4
                                                     and c.shape[0] == 1) \
                    else c
                consumed_scopes.add(f"{sc}/Const")
            layer(f"{sc}/Dense0", "synthesis.b4.fc")
            layer(f"{sc}/Conv", "synthesis.b4.conv")
        else:
            layer(f"{sc}/Conv0_up", f"synthesis.b{r}.conv0")
            layer(f"{sc}/Conv1", f"synthesis.b{r}.conv1")
        layer(f"{sc}/ToRGB", f"synthesis.b{r}.torgb")

    # per-layer noise buffers: noise0 → b4.conv, then (conv0, conv1) per
    # doubling resolution (the torch modules register them as noise_const,
    # stylegan.py:270)
    for key in list(tf_params):
        m = re.fullmatch(r"(?:synthesis/)?noise(\d+)", key)
        if not m:
            continue
        i = int(m.group(1))
        v = np.asarray(tf_params[key])
        v = v.reshape(v.shape[-2:])
        if i == 0:
            name = "synthesis.b4.conv.noise_const"
        else:
            r = 4 * (2 ** ((i + 1) // 2))
            name = f"synthesis.b{r}.conv{(i + 1) % 2}.noise_const"
        out[name] = v
        consumed_scopes.add(key)

    # encoder pyramid (co-mod-gan keeps E_* inside G_synthesis; accept a
    # separate component prefix too)
    for key in list(tf_params):
        m = re.match(r"(?:synthesis/)?(E_(\d+)x\2)/", key)
        if not m:
            continue
        sc, r = key[:key.index(m.group(1)) + len(m.group(1))], int(m.group(2))
        if r == 4:
            layer(f"{sc}/Conv", "encoder.b4.conv")
            layer(f"{sc}/Dense0", "encoder.b4.fc")
            layer(f"{sc}/Dense1", "encoder.b4.out")
        else:
            layer(f"{sc}/FromRGB", f"encoder.b{r}.fromrgb")
            layer(f"{sc}/Conv0", f"encoder.b{r}.conv0")
            layer(f"{sc}/Conv1_down", f"encoder.b{r}.conv1")

    matched_keys = set()
    for sc in consumed_scopes:
        for k in tf_params:
            if k == sc or k.startswith(sc + "/"):
                matched_keys.add(k)
    # resample filters / lod counters etc. are trace-time constants here
    unmatched = sorted(k for k in tf_params if k not in matched_keys
                       and not k.endswith("resample_kernel")
                       and k.rsplit("/", 1)[-1] != "lod")
    return out, unmatched
