"""InceptionV3 FID feature extractor in JAX.

The reference downloads NVIDIA's TorchScript ``inception-2015-12-05``
detector and takes its 2048-d pool features of uint8 images
(`/root/reference/lib/evaluator/eva_fid.py:21,145-223`).  This module
implements the equivalent network natively in JAX: the pytorch-fid variant
of InceptionV3 (the faithful port of the same TF ``pool_3`` graph, with its
count-include-pad/max-pool pooling quirks), with weights loadable from a
pytorch-fid / torchvision ``.pth`` via the torch-free reader.

Everything is eval-mode: batch norms are folded into scale/shift at load
time, so the whole feature extractor is a pure jitted function.

Weights are NOT bundled (no network access at build time): pass
``weights_path`` pointing at e.g. ``pt_inception-2015-12-05-6726825d.pth``.
Random-initialized mode is supported for machinery tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NCHW", "OIHW", "NCHW")
_BN_EPS = 1e-3


# ---------------------------------------------------------------------------
# primitive: conv + (folded) batchnorm + relu
# ---------------------------------------------------------------------------

def _conv_bn(params, x, stride=1, padding=(0, 0)):
    w = params["w"]  # [O, I, kh, kw] already BN-folded
    b = params["b"]
    if isinstance(padding, int):
        padding = (padding, padding)
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=_DN)
    return jnp.maximum(y + b.astype(y.dtype)[None, :, None, None], 0.0)


def _maxpool(x, k=3, s=2, pad=0):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, k, k), (1, 1, s, s),
        [(0, 0), (0, 0), (pad, pad), (pad, pad)])


def _avgpool_exc(x, k=3, s=1, pad=1):
    """3×3 average pooling, count_include_pad=False (the FID-variant patch
    to torchvision's InceptionA/C/E blocks)."""
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, 1, k, k), (1, 1, s, s),
        [(0, 0), (0, 0), (pad, pad), (pad, pad)])
    count = lax.reduce_window(
        jnp.ones(x.shape[2:], x.dtype), 0.0, lax.add, (k, k), (s, s),
        [(pad, pad), (pad, pad)])
    return summed / count[None, None]


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _inception_a(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_1"], x)
    b5 = _conv_bn(p["branch5x5_2"], b5, padding=2)
    b3 = _conv_bn(p["branch3x3dbl_1"], x)
    b3 = _conv_bn(p["branch3x3dbl_2"], b3, padding=1)
    b3 = _conv_bn(p["branch3x3dbl_3"], b3, padding=1)
    bp = _avgpool_exc(x)
    bp = _conv_bn(p["branch_pool"], bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(p, x):
    b3 = _conv_bn(p["branch3x3"], x, stride=2)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=1)
    bd = _conv_bn(p["branch3x3dbl_3"], bd, stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def _inception_c(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_1"], x)
    b7 = _conv_bn(p["branch7x7_2"], b7, padding=(0, 3))
    b7 = _conv_bn(p["branch7x7_3"], b7, padding=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_1"], x)
    bd = _conv_bn(p["branch7x7dbl_2"], bd, padding=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_3"], bd, padding=(0, 3))
    bd = _conv_bn(p["branch7x7dbl_4"], bd, padding=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_5"], bd, padding=(0, 3))
    bp = _avgpool_exc(x)
    bp = _conv_bn(p["branch_pool"], bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(p, x):
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = _conv_bn(p["branch3x3_2"], b3, stride=2)
    b7 = _conv_bn(p["branch7x7x3_1"], x)
    b7 = _conv_bn(p["branch7x7x3_2"], b7, padding=(0, 3))
    b7 = _conv_bn(p["branch7x7x3_3"], b7, padding=(3, 0))
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def _inception_e(p, x, pool="avg"):
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p["branch3x3_2a"], b3, padding=(0, 1)),
        _conv_bn(p["branch3x3_2b"], b3, padding=(1, 0)),
    ], axis=1)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate([
        _conv_bn(p["branch3x3dbl_3a"], bd, padding=(0, 1)),
        _conv_bn(p["branch3x3dbl_3b"], bd, padding=(1, 0)),
    ], axis=1)
    if pool == "avg":
        bp = _avgpool_exc(x)
    else:  # Mixed_7c in the FID graph uses max pooling
        bp = _maxpool(x, k=3, s=1, pad=1)
    bp = _conv_bn(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


_STEM = [
    ("Conv2d_1a_3x3", dict(stride=2)),
    ("Conv2d_2a_3x3", dict()),
    ("Conv2d_2b_3x3", dict(padding=1)),
    ("maxpool1", None),
    ("Conv2d_3b_1x1", dict()),
    ("Conv2d_4a_3x3", dict()),
    ("maxpool2", None),
]

_MIXED = [
    ("Mixed_5b", _inception_a), ("Mixed_5c", _inception_a),
    ("Mixed_5d", _inception_a), ("Mixed_6a", _inception_b),
    ("Mixed_6b", _inception_c), ("Mixed_6c", _inception_c),
    ("Mixed_6d", _inception_c), ("Mixed_6e", _inception_c),
    ("Mixed_7a", _inception_d),
    ("Mixed_7b", lambda p, x: _inception_e(p, x, "avg")),
    ("Mixed_7c", lambda p, x: _inception_e(p, x, "max")),
]


def _ts_resize_matrix(out_size, in_size):
    """1-D interpolation matrix [out, in] of the TF-style asymmetric
    bilinear resize: source coordinate ``s = i * in/out`` (NOT half-pixel
    centers), edge-clamped.  This is what the reference's TorchScript
    detector computes internally — its scripted forward resizes via
    ``affine_grid``/``grid_sample(align_corners=False, padding='border')``
    with ``theta[d, 2] += 1/in - 1/299``, which algebraically reduces to
    exactly ``s = i * in/299`` (TF1 ``resize_bilinear`` semantics, the
    graph `eva_fid.py:21` was ported from)."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        s = i * in_size / out_size
        i0 = min(int(np.floor(s)), in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        w = np.float32(s - np.floor(s))
        m[i, i0] += 1.0 - w
        m[i, i1] += w
    return m


def _resize_299(x, policy="ts"):
    """Resize to the detector's 299² input.

    ``policy="ts"`` (default): the TF-style asymmetric bilinear the
    reference's TorchScript ``inception-2015-12-05`` performs internally
    (`eva_fid.py:21,206-212`) — the policy that makes absolute FID (and
    real-feature caches) comparable with the reference.  Applied as two
    static matmuls (separable 1-D kernels), MXU-friendly.

    ``policy="bilinear"``: half-pixel-centered bilinear, antialias=False —
    pytorch-fid's ``F.interpolate`` behavior (its pt_inception wrapper).
    jax's default antialias=True diverges by >130 intensity units per
    pixel for 512²→299 inputs (measured r3; upsampled ≤299 inputs are
    unaffected, which is why 256² fixtures never catch it)."""
    if policy == "ts":
        if x.shape[2] == 299 and x.shape[3] == 299:
            return x  # s = i exactly: the resize is the identity
        rh = jnp.asarray(_ts_resize_matrix(299, x.shape[2]))
        rw = jnp.asarray(_ts_resize_matrix(299, x.shape[3]))
        y = jnp.einsum("nchw,oh->ncow", x, rh)
        return jnp.einsum("ncow,pw->ncop", y, rw)
    if policy == "bilinear":
        return jax.image.resize(x, (x.shape[0], 3, 299, 299),
                                method="bilinear", antialias=False)
    raise ValueError(f"unknown resize_policy [{policy}] "
                     "(expected 'ts' or 'bilinear')")


def inception_features(params, x_uint8, resize_policy="ts"):
    """uint8-valued [N, 3, H, W] (0..255, float or uint8) → [N, 2048]
    pool features, matching the reference detector's input contract
    (`eva_fid.py:206-212`: composited uint8 images).  ``resize_policy``
    (static): see :func:`_resize_299`."""
    x = _resize_299(x_uint8.astype(jnp.float32), resize_policy)
    x = x / 127.5 - 1.0
    for name, kw in _STEM:
        if kw is None:
            x = _maxpool(x)
        else:
            x = _conv_bn(params[name], x, **kw)
    for name, fn in _MIXED:
        x = fn(params[name], x)
    x = x.mean(axis=(2, 3))  # adaptive avg pool to 1×1
    return x


def inception_features_and_probs(params, x_uint8, resize_policy="ts"):
    """Like :func:`inception_features`, but also returns the 1008-way
    softmax class probabilities from the classifier head (the reference's
    IS input — `inception_score.py:27-29` consumes detector ``softmax``
    outputs; the pytorch-fid graph keeps the same 1008-class fc as the
    TF ``inception-2015-12-05`` detector).

    The fc BIAS is deliberately not applied: the reference scores IS with
    ``detector_kwargs = dict(no_output_bias=True)`` "to match the original
    implementation" (`inception_score.py:20`)."""
    feat = inception_features(params, x_uint8, resize_policy)
    return feat, inception_probs_from_features(params, feat)


def inception_probs_from_features(params, feat):
    """[N, 2048] pool features → [N, 1008] softmax probs (the classifier
    head alone — lets a features-only pass be upgraded to probs without
    re-running the trunk)."""
    feat = feat.astype(jnp.float32)
    fc = params["fc"]
    w = fc["w"].reshape(fc["w"].shape[0], -1)  # [1008, 2048] (or conv-shaped)
    logits = feat @ w.T.astype(feat.dtype)
    return jax.nn.softmax(logits, axis=-1)


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------

def _fold_bn(conv_w, bn_w, bn_b, bn_mean, bn_var):
    scale = bn_w / np.sqrt(bn_var + _BN_EPS)
    w = conv_w * scale[:, None, None, None]
    b = bn_b - bn_mean * scale
    return {"w": jnp.asarray(w, jnp.float32),
            "b": jnp.asarray(b, jnp.float32)}


def load_inception_params(weights):
    """Load pytorch-fid / torchvision InceptionV3 weights and fold batch
    norms.  ``weights``: a ``.pth`` path, or an already-loaded state_dict
    (name → array) for in-memory injection (tests, converters)."""
    if isinstance(weights, dict):
        sd = weights
    else:
        from ..checkpoint.torch_reader import load_torch_pth
        sd = load_torch_pth(weights)
    params = {}
    names = {n.rsplit(".", 2)[0] for n in sd if ".conv.weight" in n}
    for name in names:
        top, sub = (name.split(".", 1) + [None])[:2] if "." in name \
            else (name, None)
        entry = _fold_bn(
            np.asarray(sd[f"{name}.conv.weight"], np.float64),
            np.asarray(sd[f"{name}.bn.weight"], np.float64),
            np.asarray(sd[f"{name}.bn.bias"], np.float64),
            np.asarray(sd[f"{name}.bn.running_mean"], np.float64),
            np.asarray(sd[f"{name}.bn.running_var"], np.float64))
        if sub is None:
            params[top] = entry
        else:
            params.setdefault(top, {})[sub] = entry
    if "fc.weight" in sd:  # classifier head (1008-way in the FID variant)
        params["fc"] = {"w": jnp.asarray(np.asarray(sd["fc.weight"]),
                                         jnp.float32),
                        "b": jnp.asarray(np.asarray(sd["fc.bias"]),
                                         jnp.float32)}
    return params


_A_CH = {"Mixed_5b": (192, 32), "Mixed_5c": (256, 64), "Mixed_5d": (288, 64)}
_C_CH = {"Mixed_6b": 128, "Mixed_6c": 160, "Mixed_6d": 160, "Mixed_6e": 192}


def _conv_spec():
    """Nested {module: (out, in, kh, kw)} spec of every conv in the FID
    graph (the pytorch-fid ``pt_inception`` topology)."""
    spec = {}

    def conv(i, o, kh, kw=None):
        kw = kh if kw is None else kw
        return (o, i, kh, kw)

    spec["Conv2d_1a_3x3"] = conv(3, 32, 3)
    spec["Conv2d_2a_3x3"] = conv(32, 32, 3)
    spec["Conv2d_2b_3x3"] = conv(32, 64, 3)
    spec["Conv2d_3b_1x1"] = conv(64, 80, 1)
    spec["Conv2d_4a_3x3"] = conv(80, 192, 3)
    for name, (ic, pc) in _A_CH.items():
        spec[name] = {
            "branch1x1": conv(ic, 64, 1),
            "branch5x5_1": conv(ic, 48, 1), "branch5x5_2": conv(48, 64, 5),
            "branch3x3dbl_1": conv(ic, 64, 1),
            "branch3x3dbl_2": conv(64, 96, 3),
            "branch3x3dbl_3": conv(96, 96, 3),
            "branch_pool": conv(ic, pc, 1)}
    spec["Mixed_6a"] = {
        "branch3x3": conv(288, 384, 3),
        "branch3x3dbl_1": conv(288, 64, 1),
        "branch3x3dbl_2": conv(64, 96, 3),
        "branch3x3dbl_3": conv(96, 96, 3)}
    for name, c7 in _C_CH.items():
        spec[name] = {
            "branch1x1": conv(768, 192, 1),
            "branch7x7_1": conv(768, c7, 1),
            "branch7x7_2": conv(c7, c7, 1, 7),
            "branch7x7_3": conv(c7, 192, 7, 1),
            "branch7x7dbl_1": conv(768, c7, 1),
            "branch7x7dbl_2": conv(c7, c7, 7, 1),
            "branch7x7dbl_3": conv(c7, c7, 1, 7),
            "branch7x7dbl_4": conv(c7, c7, 7, 1),
            "branch7x7dbl_5": conv(c7, 192, 1, 7),
            "branch_pool": conv(768, 192, 1)}
    spec["Mixed_7a"] = {
        "branch3x3_1": conv(768, 192, 1), "branch3x3_2": conv(192, 320, 3),
        "branch7x7x3_1": conv(768, 192, 1),
        "branch7x7x3_2": conv(192, 192, 1, 7),
        "branch7x7x3_3": conv(192, 192, 7, 1),
        "branch7x7x3_4": conv(192, 192, 3)}
    for name, ic in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        spec[name] = {
            "branch1x1": conv(ic, 320, 1),
            "branch3x3_1": conv(ic, 384, 1),
            "branch3x3_2a": conv(384, 384, 1, 3),
            "branch3x3_2b": conv(384, 384, 3, 1),
            "branch3x3dbl_1": conv(ic, 448, 1),
            "branch3x3dbl_2": conv(448, 384, 3),
            "branch3x3dbl_3a": conv(384, 384, 1, 3),
            "branch3x3dbl_3b": conv(384, 384, 3, 1),
            "branch_pool": conv(ic, 192, 1)}

    spec["fc"] = conv(2048, 1008, 1, 1)  # classifier head, built as [O,I,1,1]
    return spec


def inception_conv_shapes():
    """Flat {qualified_name: (out, in, kh, kw)} of every conv (plus 'fc'),
    qualified like the pytorch-fid state_dict (``Mixed_5b.branch1x1``)."""
    flat = {}
    for top, v in _conv_spec().items():
        if isinstance(v, tuple):
            flat[top] = v
        else:
            for sub, s in v.items():
                flat[f"{top}.{sub}"] = s
    return flat


def random_inception_state_dict(seed=0):
    """Shape-correct random pytorch-fid style state_dict (numpy arrays) —
    feeds both :func:`load_inception_params` and torch oracles for
    weight-free port-parity tests (tools/validate_fid.py)."""
    rng = np.random.RandomState(seed)
    sd = {}
    for name, (o, i, kh, kw) in inception_conv_shapes().items():
        if name == "fc":
            sd["fc.weight"] = (rng.randn(o, i) / np.sqrt(i)).astype(
                np.float32)
            sd["fc.bias"] = np.zeros(o, np.float32)
            continue
        fan_in = i * kh * kw
        sd[f"{name}.conv.weight"] = (
            rng.randn(o, i, kh, kw) / np.sqrt(fan_in)).astype(np.float32)
        sd[f"{name}.bn.weight"] = (
            0.5 + rng.rand(o) * 1.5).astype(np.float32)
        sd[f"{name}.bn.bias"] = (rng.randn(o) * 0.1).astype(np.float32)
        sd[f"{name}.bn.running_mean"] = (rng.randn(o) * 0.1).astype(
            np.float32)
        sd[f"{name}.bn.running_var"] = (
            0.5 + rng.rand(o)).astype(np.float32)
    return sd


def random_inception_params(key):
    """Shape-correct random parameters (for machinery tests without
    weights)."""
    spec = _conv_spec()

    def build(s, key):
        if isinstance(s, tuple):
            k1, k2 = jax.random.split(key)
            fan_in = s[1] * s[2] * s[3]
            return {"w": jax.random.normal(k1, s, jnp.float32)
                    / np.sqrt(fan_in),
                    "b": jnp.zeros((s[0],), jnp.float32)}
        keys = jax.random.split(key, len(s))
        return {k: build(v, ki) for (k, v), ki in zip(s.items(), keys)}

    return build(spec, key)
