"""SSIM evaluator (11×11 Gaussian window, per-image).

Reference: `/root/reference/lib/evaluator/eva_ssim.py:12-127` — the standard
pytorch-ssim formulation with σ=1.5 Gaussian window, C1=0.01², C2=0.03²,
computed per-image (``size_average=False``).  Implemented as a jitted
depthwise convolution so the metric runs on-device alongside generation.

(NB: the reference's ``add_batch`` double-appends results via a shadowing
loop, `eva_ssim.py:106-113` — a defect noted in SURVEY §2.5 and not
reproduced here; for a full dataset pass its mean is unaffected.)
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .base import BaseEvaluator, register_evaluator


def _gaussian_window(window_size=11, sigma=1.5):
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


@partial(jax.jit, static_argnames=("window_size",))
def compute_ssim(img1, img2, window_size=11):
    """Per-image SSIM for NCHW inputs in [0, 1] (uint8 0..255 device
    views rescale inside the jit — the C1/C2 stabilizers assume unit
    range, same convention as the reference's eva_ssim.py)."""
    def to01(x):
        if x.dtype == jnp.uint8:
            return x.astype(jnp.float32) / 255.0
        return x.astype(jnp.float32)
    img1, img2 = to01(img1), to01(img2)
    c = img1.shape[1]
    w = jnp.asarray(_gaussian_window(window_size))
    kernel = jnp.broadcast_to(w[None, None], (c, 1, window_size, window_size))
    pad = window_size // 2

    def filt(x):
        return lax.conv_general_dilated(
            x, kernel, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c)

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = (((2 * mu1_mu2 + C1) * (2 * sigma12 + C2))
                / ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)))
    return ssim_map.mean(axis=(1, 2, 3))


@register_evaluator("ssim")
class SSIMEvaluator(BaseEvaluator):
    # reads pred_dev/gt_dev when present (compute_ssim rescales uint8
    # device views inside the jit) — a compose containing SSIM must not
    # re-enable the per-batch full-image device→host readback
    consumes_host_pixels = False
    consumes_device_views = True

    def __init__(self, window_size=11):
        super().__init__()
        self.window_size = window_size
        self.data_ssim = []

    def add_batch(self, pred, gt, valid=None, pred_dev=None, gt_dev=None,
                  **_):
        pred = pred_dev if pred_dev is not None else jnp.asarray(
            np.asarray(pred), jnp.float32)
        gt = gt_dev if gt_dev is not None else jnp.asarray(
            np.asarray(gt), jnp.float32)
        # multi-host: dev views are GLOBAL sharded arrays — keep this
        # process's contiguous rows (single-host: plain np.asarray)
        from ..parallel import local_rows
        s = np.asarray(local_rows(compute_ssim(pred, gt, self.window_size)),
                       np.float64)
        (s,) = self._apply_valid([s], valid)
        self.data_ssim.append(s)

    def compute(self):
        s = np.concatenate(self.data_ssim, axis=0)
        if self.sample_n is not None:
            s = s[: self.sample_n]
        self.final["ssim"] = float(s.mean())
        return self.final["ssim"]

    def one_line_summary(self):
        self._log("Evaluator ssim: {:.4f}".format(self.final["ssim"]))

    def clear_data(self):
        self.data_ssim = []
