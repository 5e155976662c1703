"""LPIPS perceptual metric in JAX — AlexNet and VGG16 backbones.

Reference: `/root/reference/lib/evaluator/eva_lpips.py:10-83` — wraps the
``lpips`` package's ``LPIPS(net='alex')`` with inputs in [0, 1] renormalized
to ±1; the PPL metric instead embeds with vgg16 ``return_lpips=True``
(`stylegan_metrics/perceptual_path_length.py:41-48`).  Here both are
implemented natively: backbone conv features at 5 relu taps, per-channel
unit normalization, squared differences, learned 1×1 linear weights,
spatial mean, layer sum — all one jitted function.

Weights are not bundled; provide (see docs/ASSETS.md):
  * alex: ``alexnet_weights`` = torchvision ``alexnet-owt*.pth``
    (features.* keys) + ``lin_weights`` = lpips ``v0.1/alex.pth``
    (env ``SHGAN_TPU_ALEXNET`` / ``SHGAN_TPU_LPIPS_LIN``);
  * vgg16: ``vgg16_weights`` = torchvision ``vgg16-*.pth`` or a flat dump
    converted from NVIDIA's metric ``vgg16.pt`` (tools/convert_vgg16.py)
    + ``lin_weights`` = lpips ``v0.1/vgg.pth``
    (env ``SHGAN_TPU_VGG16`` / ``SHGAN_TPU_LPIPS_LIN_VGG``).
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .base import BaseEvaluator, register_evaluator

_DN = ("NCHW", "OIHW", "NCHW")

# (out_ch, kernel, stride, pad) per conv; relu after each, maxpool after 1,2
_ALEX_CFG = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
             (256, 3, 1, 1), (256, 3, 1, 1)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _alex_features(params, x):
    """x in [-1, 1] → list of 5 relu feature maps."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(
        _SCALE)[None, :, None, None]
    feats = []
    for i, (_, _, s, p) in enumerate(_ALEX_CFG):
        w, b = params[f"conv{i}"]["weight"], params[f"conv{i}"]["bias"]
        x = lax.conv_general_dilated(x, w.astype(x.dtype), (s, s),
                                     [(p, p), (p, p)],
                                     dimension_numbers=_DN)
        x = jnp.maximum(x + b.astype(x.dtype)[None, :, None, None], 0.0)
        feats.append(x)
        if i in (0, 1):
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 3, 3),
                                  (1, 1, 2, 2), "VALID")
    return feats


# VGG16 "features" plan: conv counts per block (torchvision indices in
# comments); LPIPS taps the relu after each block, maxpool 2×2 between
_VGG_BLOCKS = [2, 2, 3, 3, 3]          # conv3x3 per block
_VGG_CHANNELS = [64, 128, 256, 512, 512]


def _vgg_features(params, x):
    """x in [-1, 1] → the 5 LPIPS relu taps (relu1_2 … relu5_3)."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(
        _SCALE)[None, :, None, None]
    feats = []
    k = 0
    for bi, n in enumerate(_VGG_BLOCKS):
        for _ in range(n):
            w, b = params[f"conv{k}"]["weight"], params[f"conv{k}"]["bias"]
            x = lax.conv_general_dilated(x, w.astype(x.dtype), (1, 1),
                                         [(1, 1), (1, 1)],
                                         dimension_numbers=_DN)
            x = jnp.maximum(x + b.astype(x.dtype)[None, :, None, None], 0.0)
            k += 1
        feats.append(x)
        if bi < len(_VGG_BLOCKS) - 1:
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2),
                                  (1, 1, 2, 2), "VALID")
    return feats


def _backbone_features(params, x, net):
    return (_vgg_features(params, x) if net == "vgg16"
            else _alex_features(params, x))


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=1, keepdims=True))
    return f / (norm + eps)


def lpips_distance(params, x0, x1, net="alex"):
    """x0, x1 in [-1, 1], NCHW → [N] LPIPS distances.  ``net`` is static
    under jit (selects the backbone graph)."""
    f0 = _backbone_features(params, x0, net)
    f1 = _backbone_features(params, x1, net)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        d = jnp.square(_unit_normalize(a) - _unit_normalize(b))
        lin = params[f"lin{i}"]["weight"]  # [1, C, 1, 1]
        total = total + (d * lin.astype(d.dtype)).sum(axis=1).mean(
            axis=(1, 2))
    return total


def load_lpips_params(alexnet_weights, lin_weights):
    from ..checkpoint.torch_reader import load_torch_pth
    asd = load_torch_pth(alexnet_weights)
    lsd = load_torch_pth(lin_weights)
    params = {}
    conv_idx = [0, 3, 6, 8, 10]  # torchvision features.* indices
    for i, j in enumerate(conv_idx):
        params[f"conv{i}"] = {
            "weight": jnp.asarray(asd[f"features.{j}.weight"], jnp.float32),
            "bias": jnp.asarray(asd[f"features.{j}.bias"], jnp.float32)}
    _load_lins(params, lsd)
    return params


def _load_lins(params, lsd):
    candidates = ("lin{i}.model.1.weight", "lins.{i}.model.1.weight",
                  "lin{i}.weight")
    for i in range(5):
        for pat in candidates:
            key = pat.format(i=i)
            if key in lsd:
                break
        else:
            raise KeyError(
                f"lin weights for layer {i} not found — expected one of "
                f"{[p.format(i=i) for p in candidates]} in the lin-weights"
                f" file (keys present: {sorted(lsd)[:8]}…)")
        params[f"lin{i}"] = {"weight": jnp.asarray(lsd[key], jnp.float32)}


# torchvision vgg16 features.* conv indices
_VGG_TV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def load_vgg16_lpips_params(vgg16_weights, lin_weights):
    """VGG16-backbone LPIPS params (the reference PPL's embedding choice,
    `perceptual_path_length.py:41-48`).

    ``vgg16_weights``: torchvision ``vgg16-*.pth`` (``features.N.*`` keys)
    or a flat ``conv{0..12}.weight/bias`` dump (tools/convert_vgg16.py
    produces one from NVIDIA's metric ``vgg16.pt``).
    ``lin_weights``: lpips ``v0.1/vgg.pth``."""
    from ..checkpoint.torch_reader import load_torch_pth
    vsd = load_torch_pth(vgg16_weights)
    lsd = load_torch_pth(lin_weights)
    params = {}
    if "features.0.weight" in vsd:
        for i, j in enumerate(_VGG_TV_IDX):
            params[f"conv{i}"] = {
                "weight": jnp.asarray(vsd[f"features.{j}.weight"],
                                      jnp.float32),
                "bias": jnp.asarray(vsd[f"features.{j}.bias"], jnp.float32)}
    else:  # flat conv{k} dump
        for i in range(13):
            params[f"conv{i}"] = {
                "weight": jnp.asarray(vsd[f"conv{i}.weight"], jnp.float32),
                "bias": jnp.asarray(vsd[f"conv{i}.bias"], jnp.float32)}
    _load_lins(params, lsd)
    return params


def random_lpips_params(key):
    """Shape-correct random params for machinery tests."""
    params = {}
    ic = 3
    ks = [11, 5, 3, 3, 3]
    for i, (oc, k, _, _) in enumerate(_ALEX_CFG):
        k1, k2, key = jax.random.split(key, 3)
        params[f"conv{i}"] = {
            "weight": jax.random.normal(k1, (oc, ic, k, k), jnp.float32)
            * 0.05,
            "bias": jnp.zeros((oc,), jnp.float32)}
        ic = oc
    for i, c in enumerate([64, 192, 384, 256, 256]):
        key, k1 = jax.random.split(key)
        params[f"lin{i}"] = {"weight": jax.random.uniform(
            k1, (1, c, 1, 1), jnp.float32)}
    return params


def resolve_lpips_params(net="alex", alexnet_weights=None,
                         vgg16_weights=None, lin_weights=None):
    """Resolve backbone+lin weights for the chosen net from args or the
    documented env vars (docs/ASSETS.md)."""
    if net == "alex":
        aw = alexnet_weights or os.environ.get("SHGAN_TPU_ALEXNET")
        lw = lin_weights or os.environ.get("SHGAN_TPU_LPIPS_LIN")
        if not (aw and lw and osp.isfile(aw) and osp.isfile(lw)):
            raise FileNotFoundError(
                "LPIPS needs alexnet + lin weights: pass "
                "alexnet_weights=/lin_weights= or set "
                "SHGAN_TPU_ALEXNET / SHGAN_TPU_LPIPS_LIN")
        return load_lpips_params(aw, lw)
    if net == "vgg16":
        vw = vgg16_weights or os.environ.get("SHGAN_TPU_VGG16")
        lw = lin_weights or os.environ.get("SHGAN_TPU_LPIPS_LIN_VGG")
        if not (vw and lw and osp.isfile(vw) and osp.isfile(lw)):
            raise FileNotFoundError(
                "LPIPS(vgg16) needs vgg16 + lin weights: pass "
                "vgg16_weights=/lin_weights= or set "
                "SHGAN_TPU_VGG16 / SHGAN_TPU_LPIPS_LIN_VGG")
        return load_vgg16_lpips_params(vw, lw)
    raise ValueError(f"unknown LPIPS net {net!r} (alex | vgg16)")


def random_vgg16_lpips_params(key):
    """Shape-correct random vgg16-LPIPS params for machinery tests."""
    params = {}
    ic, k = 3, 0
    for bi, n in enumerate(_VGG_BLOCKS):
        for _ in range(n):
            key, k1 = jax.random.split(key)
            params[f"conv{k}"] = {
                "weight": jax.random.normal(
                    k1, (_VGG_CHANNELS[bi], ic, 3, 3), jnp.float32) * 0.05,
                "bias": jnp.zeros((_VGG_CHANNELS[bi],), jnp.float32)}
            ic = _VGG_CHANNELS[bi]
            k += 1
    for i, c in enumerate(_VGG_CHANNELS):
        key, k1 = jax.random.split(key)
        params[f"lin{i}"] = {"weight": jax.random.uniform(
            k1, (1, c, 1, 1), jnp.float32)}
    return params


@register_evaluator("lpips")
class LPIPSEvaluator(BaseEvaluator):
    # reads pred_dev/gt_dev when present — device-fed, no host pixels
    consumes_host_pixels = False
    consumes_device_views = True

    def __init__(self, net="alex", alexnet_weights=None, lin_weights=None,
                 params=None, vgg16_weights=None, **_):
        super().__init__()
        self.net = net
        if params is not None:
            self.params = params
        else:
            self.params = resolve_lpips_params(
                net, alexnet_weights=alexnet_weights,
                vgg16_weights=vgg16_weights, lin_weights=lin_weights)
        self.data = []

        def dist(params, x0, x1):
            # normalize INSIDE the jit: [0,1] floats → ±1, or uint8
            # 0..255 device views (u8 transport) → ±1 with no extra
            # host/HBM copies
            def to_pm1(x):
                if x.dtype == jnp.uint8:
                    return x.astype(jnp.float32) / 127.5 - 1.0
                return x.astype(jnp.float32) * 2 - 1
            return lpips_distance(params, to_pm1(x0), to_pm1(x1), net=net)

        self._dist = jax.jit(dist)

    def add_batch(self, pred, gt, valid=None, pred_dev=None, gt_dev=None,
                  **_):
        """pred/gt in [0, 1] (renormalized to ±1, eva_lpips.py:39-52).
        ``pred_dev``/``gt_dev``: optional on-device copies ([0,1] floats
        or uint8 0..255) — used preferentially so the distance net reads
        device-to-device."""
        x0 = np.asarray(pred) if pred_dev is None else pred_dev
        x1 = np.asarray(gt) if gt_dev is None else gt_dev
        # multi-host: the dev views are GLOBAL sharded arrays — keep this
        # process's contiguous rows (parallel/multihost.py local_rows;
        # single-host it is a plain np.asarray)
        from ..parallel import local_rows
        d = np.asarray(local_rows(self._dist(self.params, x0, x1)),
                       np.float64)
        (d,) = self._apply_valid([d], valid)
        self.data.append(d)

    def compute(self):
        d = np.concatenate(self.data, 0)
        if self.sample_n is not None:
            d = d[: self.sample_n]
        self.final["lpips"] = float(d.mean())
        return self.final["lpips"]

    def one_line_summary(self):
        self._log("Evaluator lpips: {:.4f}".format(self.final["lpips"]))

    def clear_data(self):
        self.data = []
