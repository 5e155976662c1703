"""LPIPS (AlexNet backbone) perceptual metric in JAX.

Reference: `/root/reference/lib/evaluator/eva_lpips.py:10-83` — wraps the
``lpips`` package's ``LPIPS(net='alex')`` with inputs in [0, 1] renormalized
to ±1.  Here the metric is implemented natively: AlexNet conv features at
relu1-5, per-channel unit normalization, squared differences, learned 1×1
linear weights, spatial mean, layer sum — all one jitted function.

Weights are not bundled; provide:
  * ``alexnet_weights``: torchvision ``alexnet-owt*.pth`` (features.* keys)
  * ``lin_weights``: lpips ``v0.1/alex.pth`` (lin{0..4}.model.1.weight keys)
or set env ``SHGAN_TPU_ALEXNET`` / ``SHGAN_TPU_LPIPS_LIN``.
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


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=1, keepdims=True))
    return f / (norm + eps)


def lpips_distance(params, x0, x1):
    """x0, x1 in [-1, 1], NCHW → [N] LPIPS distances."""
    f0 = _alex_features(params, x0)
    f1 = _alex_features(params, x1)
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
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lsd:
            key = f"lins.{i}.model.1.weight"
        params[f"lin{i}"] = {"weight": jnp.asarray(lsd[key], jnp.float32)}
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


@register_evaluator("lpips")
class LPIPSEvaluator(BaseEvaluator):
    def __init__(self, net="alex", alexnet_weights=None, lin_weights=None,
                 params=None, **_):
        super().__init__()
        assert net == "alex", "only the alex backbone is implemented"
        if params is not None:
            self.params = params
        else:
            aw = alexnet_weights or os.environ.get("SHGAN_TPU_ALEXNET")
            lw = lin_weights or os.environ.get("SHGAN_TPU_LPIPS_LIN")
            if not (aw and lw and osp.isfile(aw) and osp.isfile(lw)):
                raise FileNotFoundError(
                    "LPIPS needs alexnet + lin weights: pass "
                    "alexnet_weights=/lin_weights= or set "
                    "SHGAN_TPU_ALEXNET / SHGAN_TPU_LPIPS_LIN")
            self.params = load_lpips_params(aw, lw)
        self.data = []
        self._dist = jax.jit(lpips_distance)

    def add_batch(self, pred, gt, valid=None, pred_dev=None, gt_dev=None,
                  **_):
        """pred/gt in [0, 1] (renormalized to ±1, eva_lpips.py:39-52).
        ``pred_dev``/``gt_dev``: optional on-device [0,1] copies — used
        preferentially so the distance net reads device-to-device."""
        x0 = jnp.asarray(np.asarray(pred) if pred_dev is None else pred_dev,
                         jnp.float32) * 2 - 1
        x1 = jnp.asarray(np.asarray(gt) if gt_dev is None else gt_dev,
                         jnp.float32) * 2 - 1
        d = np.asarray(self._dist(self.params, x0, x1), np.float64)
        (d,) = self._apply_valid([d], valid)
        self.data.append(d)

    def compute(self):
        d = np.concatenate(self.data, 0)
        if self.sample_n is not None:
            d = d[: self.sample_n]
        self.final["lpips"] = float(d.mean())
        return self.final["lpips"]

    def one_line_summary(self):
        print("Evaluator lpips: {:.4f}".format(self.final["lpips"]))

    def clear_data(self):
        self.data = []
