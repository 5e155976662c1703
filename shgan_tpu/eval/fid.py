"""FID evaluator with cached real-feature stats.

Reference: `/root/reference/lib/evaluator/eva_fid.py:160-285`.  Protocol:
2048-d Inception features of the mask-composited uint8 fake and the uint8
real; real features cached at ``.cache/<tag>_real_feat.npy`` (kept
byte-compatible with the reference cache files); Fréchet distance from
biased mean/cov with scipy's matrix sqrt on the host.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np
import jax

from .base import BaseEvaluator, register_evaluator
from .inception import inception_features, load_inception_params


def frechet_distance(mu1, sigma1, mu2, sigma2):
    """FID between two Gaussians (eva_fid.py:268-274 formulas)."""
    import scipy.linalg
    m = np.square(mu1 - mu2).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(sigma1, sigma2), disp=False)
    return float(np.real(m + np.trace(sigma1 + sigma2 - s * 2)))


def feature_stats(feat, n=None):
    """Biased mean/cov exactly as the reference (eva_fid.py:268-271)."""
    feat = np.asarray(feat, np.float64)
    if n is None:
        n = feat.shape[0]
    feat = feat[:n]
    mu = feat.mean(0)
    sigma = (feat.T @ feat) / n - np.outer(mu, mu)
    return mu, sigma


@register_evaluator("fid")
class FIDEvaluator(BaseEvaluator):
    def __init__(self, device=None, sample_real_n=None, sample_fake_n=None,
                 dsstat_cachefile_tag=None, detector_weights=None,
                 cache_dir=".cache", detector_params=None, **_):
        super().__init__()
        del device  # the reference's cuda/cpu switch; JAX places for us
        self.sample_real_n = sample_real_n
        self.sample_fake_n = sample_fake_n
        self.data_fake_feat = []
        self.data_real_feat = []
        self.dsstat_cache_file = None
        self.dsstat_use_cache = False
        if dsstat_cachefile_tag is not None:
            self.dsstat_cache_file = osp.join(
                cache_dir, dsstat_cachefile_tag + "_real_feat.npy")
            self.dsstat_use_cache = osp.isfile(self.dsstat_cache_file)
        if detector_params is not None:
            self.detector_params = detector_params
        elif detector_weights is not None and osp.isfile(detector_weights):
            self.detector_params = load_inception_params(detector_weights)
        else:
            env = os.environ.get("SHGAN_TPU_INCEPTION")
            if env and osp.isfile(env):
                self.detector_params = load_inception_params(env)
            else:
                raise FileNotFoundError(
                    "FID needs InceptionV3 weights: pass detector_weights=, "
                    "detector_params=, or set SHGAN_TPU_INCEPTION to a "
                    "pytorch-fid pt_inception .pth")
        self._features = jax.jit(
            lambda p, x: inception_features(p, x))

    def add_batch(self, fake, real, valid=None, **_):
        """fake/real: uint8-valued [N, 3, H, W] arrays (0..255)."""
        fake_feat = np.asarray(
            self._features(self.detector_params, fake), np.float64)
        real_feat = None
        if not self.dsstat_use_cache:
            real_feat = np.asarray(
                self._features(self.detector_params, real), np.float64)
        fake_feat, real_feat = self._apply_valid([fake_feat, real_feat],
                                                 valid)
        self.data_fake_feat.append(fake_feat)
        if real_feat is not None:
            self.data_real_feat.append(real_feat)

    def compute(self):
        sample_fake_n = (self.sample_n if self.sample_fake_n is None
                         else self.sample_fake_n)
        sample_real_n = (self.sample_n if self.sample_real_n is None
                         else self.sample_real_n)
        fake_feat = np.concatenate(self.data_fake_feat, 0)[:sample_fake_n]
        if self.dsstat_use_cache:
            real_feat = np.load(self.dsstat_cache_file)[:sample_real_n]
        else:
            real_feat = np.concatenate(self.data_real_feat, 0)[:sample_real_n]
            if self.dsstat_cache_file is not None:
                os.makedirs(osp.dirname(self.dsstat_cache_file),
                            exist_ok=True)
                np.save(self.dsstat_cache_file, real_feat)

        mu_f, sig_f = feature_stats(fake_feat)
        mu_r, sig_r = feature_stats(real_feat)
        fid = frechet_distance(mu_f, sig_f, mu_r, sig_r)
        self.final["fid"] = fid
        return fid

    def one_line_summary(self):
        print("Evaluator fid: {:.4f}".format(self.final["fid"]))

    def clear_data(self):
        self.data_fake_feat = []
        self.data_real_feat = []
