"""PSNR evaluator.

Reference: `/root/reference/lib/evaluator/eva_psnr.py:9-86`.
PSNR = −10·log10(mse) per image, with dataset-specific shave modes
(``for_dataset: null`` → plain, the configuration the SH-GAN experiments
use, `configs/experiment/shgan_ffhq256_eval.yaml`).
"""

from __future__ import annotations

import numpy as np

from .base import BaseEvaluator, register_evaluator


@register_evaluator("psnr")
class PSNREvaluator(BaseEvaluator):
    def __init__(self, for_dataset=None, scale=None, rgb_range=1):
        super().__init__()
        self.for_dataset = for_dataset
        self.scale = scale
        self.rgb_range = rgb_range
        self.data_psnr = []

    def add_batch(self, pred, gt, valid=None, **_):
        pred = np.asarray(pred, np.float64)
        gt = np.asarray(gt, np.float64)
        assert pred.ndim == 4 and pred.shape[1] == 3
        diff = (pred - gt) / self.rgb_range

        if self.for_dataset is None:
            v = diff
        elif self.for_dataset == "benchmark":
            shave = self.scale
            gray = np.array([65.738, 129.057, 25.064]) / 256
            diff = (diff * gray[None, :, None, None]).sum(1)
            v = diff[:, shave:-shave, shave:-shave]
        elif self.for_dataset == "div2k":
            shave = self.scale + 6
            v = diff[:, :, shave:-shave, shave:-shave]
        else:
            raise NotImplementedError(self.for_dataset)

        axes = tuple(range(1, v.ndim))
        mse = np.square(v).mean(axis=axes)
        psnr = -10 * np.log10(mse)
        (psnr,) = self._apply_valid([psnr], valid)
        self.data_psnr.append(psnr)

    def compute(self):
        psnr = np.concatenate(self.data_psnr, axis=0)
        if self.sample_n is not None:
            psnr = psnr[: self.sample_n]
        self.final["psnr"] = float(psnr.mean())
        return self.final["psnr"]

    def one_line_summary(self):
        self._log("Evaluator psnr: {:.4f}".format(self.final["psnr"]))

    def clear_data(self):
        self.data_psnr = []
