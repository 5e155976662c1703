"""FID evaluator with cached real-feature stats.

Reference: `/root/reference/lib/evaluator/eva_fid.py:160-285`.  Protocol:
2048-d Inception features of the mask-composited uint8 fake and the uint8
real; real features cached at ``.cache/<tag>_real_feat.npy`` (kept
byte-compatible with the reference cache files); Fréchet distance from
biased mean/cov with scipy's matrix sqrt on the host.  Feature extraction
goes through the shared :mod:`.detector`, so composing fid with kid/pr/is
costs one Inception pass per batch total.
"""

from __future__ import annotations

import numpy as np

from .base import register_evaluator
from .feature_metrics import FeatureBankEvaluator


def frechet_distance(mu1, sigma1, mu2, sigma2):
    """FID between two Gaussians (eva_fid.py:268-274 formulas)."""
    import scipy.linalg
    m = np.square(mu1 - mu2).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(sigma1, sigma2), disp=False)
    return float(np.real(m + np.trace(sigma1 + sigma2 - s * 2)))


def feature_stats(feat, n=None):
    """Biased mean/cov exactly as the reference (eva_fid.py:268-271).

    ``n`` is the REQUESTED sample count: the reference divides the
    covariance by it even when the bank holds fewer rows (an underfull
    bank biases sigma down there too) — pass the protocol's sample_n,
    not the row count, for parity on short datasets."""
    feat = np.asarray(feat, np.float64)
    if n is None:
        n = feat.shape[0]
    feat = feat[:n]
    mu = feat.mean(0)
    sigma = (feat.T @ feat) / n - np.outer(mu, mu)
    return mu, sigma


@register_evaluator("fid")
class FIDEvaluator(FeatureBankEvaluator):
    def compute(self):
        fake_feat, real_feat, _ = self._gather()
        nf = (self.sample_n if self.sample_fake_n is None
              else self.sample_fake_n)
        nr = (self.sample_n if self.sample_real_n is None
              else self.sample_real_n)
        mu_f, sig_f = feature_stats(fake_feat, nf)
        mu_r, sig_r = feature_stats(real_feat, nr)
        fid = frechet_distance(mu_f, sig_f, mu_r, sig_r)
        self.final["fid"] = fid
        return fid

    def one_line_summary(self):
        self._log("Evaluator fid: {:.4f}".format(self.final["fid"]))
