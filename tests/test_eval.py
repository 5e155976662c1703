"""Evaluator tests: SSIM/PSNR parity with the reference formulas, FID
machinery (stats/cache/Fréchet), LPIPS machinery, compose + result.json."""

import json
import os

import numpy as np
import pytest
import jax

from shgan_tpu.eval import (get_evaluator, PSNREvaluator, SSIMEvaluator,
                            compute_ssim, FIDEvaluator, frechet_distance,
                            LPIPSEvaluator, ComposeEvaluator)
from shgan_tpu.eval.fid import feature_stats
from shgan_tpu.eval.inception import (random_inception_params,
                                      inception_features)
from shgan_tpu.eval.lpips import random_lpips_params


def _images(n=4, res=32, seed=0):
    rng = np.random.RandomState(seed)
    pred = rng.rand(n, 3, res, res).astype(np.float32)
    gt = np.clip(pred + rng.randn(n, 3, res, res) * 0.05, 0, 1).astype(
        np.float32)
    return pred, gt


def test_ssim_vs_reference(ref):
    import torch
    import sys
    sys.path.insert(0, "/root/reference")
    # import the reference SSIM math directly (module-level, no evaluator)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_ssim_math", "/root/reference/lib/evaluator/eva_ssim.py")
    # eva_ssim imports missing nputils — reimplement via its torch ops instead
    pred, gt = _images()
    got = np.asarray(compute_ssim(pred, gt))

    # independent torch oracle implementing the documented 11x11/σ1.5 SSIM
    import torch.nn.functional as F
    w1 = torch.exp(-((torch.arange(11) - 5).float() ** 2) / (2 * 1.5 ** 2))
    w1 = w1 / w1.sum()
    w2 = (w1[:, None] @ w1[None, :]).expand(3, 1, 11, 11).contiguous()
    p, g = torch.from_numpy(pred), torch.from_numpy(gt)

    def f(x):
        return F.conv2d(x, w2, padding=5, groups=3)

    mu1, mu2 = f(p), f(g)
    s1 = f(p * p) - mu1 ** 2
    s2 = f(g * g) - mu2 ** 2
    s12 = f(p * g) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    smap = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))
    want = smap.mean(dim=(1, 2, 3)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_psnr_plain():
    pred, gt = _images()
    ev = PSNREvaluator(for_dataset=None)
    ev.add_batch(pred=pred, gt=gt)
    ev.set_sample_n(4)
    got = ev.compute()
    want = np.mean([-10 * np.log10(np.mean((pred[i] - gt[i]) ** 2))
                    for i in range(4)])
    assert got == pytest.approx(want, rel=1e-6)


def test_psnr_valid_mask():
    pred, gt = _images(6)
    ev = PSNREvaluator()
    valid = np.array([1, 1, 1, 1, 0, 0], bool)
    ev.add_batch(pred=pred, gt=gt, valid=valid)
    ev.set_sample_n(4)
    a = ev.compute()
    ev2 = PSNREvaluator()
    ev2.add_batch(pred=pred[:4], gt=gt[:4])
    ev2.set_sample_n(4)
    assert a == pytest.approx(ev2.compute(), rel=1e-9)


def test_frechet_distance_known():
    # identical Gaussians → 0; shifted means → squared distance
    mu = np.zeros(8)
    sigma = np.eye(8)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0, abs=1e-8)
    mu2 = np.ones(8) * 2.0
    assert frechet_distance(mu, sigma, mu2, sigma) == pytest.approx(
        4.0 * 8, abs=1e-6)


def test_feature_stats_biased_cov():
    rng = np.random.RandomState(0)
    f = rng.randn(100, 16)
    mu, sig = feature_stats(f)
    np.testing.assert_allclose(mu, f.mean(0))
    np.testing.assert_allclose(sig, np.cov(f.T, bias=True), atol=1e-10)


@pytest.fixture(scope="module")
def inception_params():
    return random_inception_params(jax.random.key(0))


def test_inception_feature_shape(inception_params):
    x = np.random.RandomState(0).randint(
        0, 255, (2, 3, 64, 64)).astype(np.float32)
    f = np.asarray(inception_features(inception_params, x))
    assert f.shape == (2, 2048)
    assert np.isfinite(f).all()


def test_fid_evaluator_end_to_end(tmp_path, inception_params):
    rng = np.random.RandomState(1)
    fake = rng.randint(0, 255, (8, 3, 32, 32)).astype(np.float32)
    real = rng.randint(0, 255, (8, 3, 32, 32)).astype(np.float32)
    ev = FIDEvaluator(detector_params=inception_params,
                      dsstat_cachefile_tag="testtag",
                      cache_dir=str(tmp_path))
    ev.add_batch(fake=fake, real=real)
    ev.set_sample_n(8)
    fid_self = FIDEvaluator(detector_params=inception_params)
    fid_self.add_batch(fake=real, real=real)
    fid_self.set_sample_n(8)
    assert fid_self.compute() == pytest.approx(0, abs=1e-4)
    fid = ev.compute()
    assert fid > 0
    # cache written and reused
    cache = tmp_path / "testtag_real_feat.npy"
    assert cache.exists()
    ev2 = FIDEvaluator(detector_params=inception_params,
                       dsstat_cachefile_tag="testtag",
                       cache_dir=str(tmp_path))
    assert ev2.dsstat_use_cache
    ev2.add_batch(fake=fake, real=real)
    ev2.set_sample_n(8)
    assert ev2.compute() == pytest.approx(fid, rel=1e-6)


def test_lpips_machinery():
    params = random_lpips_params(jax.random.key(0))
    pred, gt = _images(res=64)
    ev = LPIPSEvaluator(params=params)
    ev.add_batch(pred=pred, gt=gt)
    ev.set_sample_n(4)
    d = ev.compute()
    assert np.isfinite(d) and d >= 0
    # identical inputs → 0
    ev2 = LPIPSEvaluator(params=params)
    ev2.add_batch(pred=gt, gt=gt)
    ev2.set_sample_n(4)
    assert ev2.compute() == pytest.approx(0, abs=1e-6)


def test_compose_and_result_json(tmp_path):
    pred, gt = _images()
    ev = ComposeEvaluator([PSNREvaluator(), SSIMEvaluator()])
    ev.add_batch(pred=pred, gt=gt)
    ev.set_sample_n(4)
    rv = ev.compute()
    assert set(rv) == {"psnr", "ssim"}
    path = ev.save(str(tmp_path))
    with open(path) as f:
        saved = json.load(f)
    assert saved["psnr"]["psnr"] == pytest.approx(rv["psnr"])


def test_get_evaluator_from_cfg():
    ev = get_evaluator([
        {"type": "psnr", "args": {"for_dataset": None}},
        {"type": "ssim", "args": {"window_size": 11}},
    ])
    assert isinstance(ev, ComposeEvaluator)
