"""Tests for the KID / precision-recall / IS / PPL metric math."""

import numpy as np
import pytest

from shgan_tpu.eval.stylegan_metrics import (
    compute_kid, compute_precision_recall, compute_inception_score,
    slerp, ppl_from_distances)


def test_kid_identical_distributions_near_zero():
    rng = np.random.RandomState(0)
    feats = rng.randn(512, 64)
    kid = compute_kid(feats[:256], feats[256:], num_subsets=20,
                      max_subset_size=128)
    shifted = feats[256:] + 2.0
    kid_far = compute_kid(feats[:256], shifted, num_subsets=20,
                          max_subset_size=128)
    assert abs(kid) < 0.05
    assert kid_far > kid + 1.0


def test_kid_matches_reference_formula():
    """Cross-check against the reference computation with a fixed seed."""
    rng = np.random.RandomState(1)
    real = rng.randn(64, 16)
    gen = rng.randn(64, 16) * 1.3
    # independent re-computation of the subset-MMD estimator
    rs = np.random.RandomState(0)
    n, m = 16, 32
    t = 0.0
    for _ in range(5):
        x = gen[rs.choice(64, m, replace=False)]
        y = real[rs.choice(64, m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.diag(a).sum()) / (m - 1) - b.sum() * 2 / m
    want = t / 5 / m
    got = compute_kid(real, gen, num_subsets=5, max_subset_size=32, seed=0)
    assert got == pytest.approx(want, rel=1e-9)


def test_precision_recall_sanity():
    rng = np.random.RandomState(2)
    real = rng.randn(200, 8)
    # gen identical to real → both near 1
    p, r = compute_precision_recall(real, real.copy() + 1e-6 * rng.randn(200, 8))
    assert p > 0.95 and r > 0.95
    # gen far away → precision ~0
    p2, r2 = compute_precision_recall(real, real + 50)
    assert p2 < 0.05 and r2 < 0.05


def test_inception_score_uniform_vs_confident():
    n, c = 100, 10
    uniform = np.full((n, c), 1.0 / c)
    is_u, _ = compute_inception_score(uniform, num_splits=5)
    assert is_u == pytest.approx(1.0, abs=1e-6)
    confident = np.full((n, c), 1e-6)
    for i in range(n):
        confident[i, i % c] = 1 - 1e-6 * (c - 1)
    is_c, _ = compute_inception_score(confident, num_splits=5)
    assert is_c > 5


def test_slerp_endpoints():
    rng = np.random.RandomState(3)
    a = rng.randn(4, 8)
    b = rng.randn(4, 8)
    an = a / np.linalg.norm(a, axis=-1, keepdims=True)
    np.testing.assert_allclose(slerp(a, b, 0.0), an, atol=1e-12)
    bn = b / np.linalg.norm(b, axis=-1, keepdims=True)
    np.testing.assert_allclose(slerp(a, b, 1.0), bn, atol=1e-7)


def test_ppl_tail_filter():
    # inclusive percentile filter (perceptual_path_length.py:119-124):
    # arange(1000) → lo = value at idx 9, hi = value at idx 990
    d = np.arange(1000, dtype=float)
    np.random.RandomState(0).shuffle(d)
    assert ppl_from_distances(d) == pytest.approx(np.arange(9, 991).mean())
