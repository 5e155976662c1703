"""Evaluator tests: SSIM/PSNR parity with the reference formulas, FID
machinery (stats/cache/Fréchet), LPIPS machinery, compose + result.json."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

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


def test_inception_resize_matches_torch_downsample():
    """The detector's 299² resize must match the reference's plain
    (non-antialiased) bilinear F.interpolate for DOWNsampled inputs —
    jax's antialias default diverges by >130 u8 units at 512²→299
    (measured r3), which would make production-resolution FID
    non-comparable (eval/inception.py _resize_299).  Upsampling (≤299
    inputs, e.g. the 256² fixtures) can't catch this."""
    import torch
    import torch.nn.functional as F
    from shgan_tpu.eval.inception import _resize_299

    rng = np.random.RandomState(0)
    for res in (512, 192):
        x = rng.rand(2, 3, res, res).astype(np.float32) * 255
        want = F.interpolate(torch.from_numpy(x), size=(299, 299),
                             mode="bilinear", align_corners=False).numpy()
        got = np.asarray(_resize_299(x, "bilinear"))
        assert np.abs(got - want).max() < 1e-3, res


def test_ssim_device_fed_u8_matches_host():
    """SSIM is fully device-fed (consumes_host_pixels=False): uint8 0..255
    device views must give the same value as host [0,1] floats — a compose
    with SSIM must not re-enable the full-image device→host readback
    (eval/ssim.py)."""
    import jax.numpy as jnp
    from shgan_tpu.eval.ssim import SSIMEvaluator

    assert SSIMEvaluator.consumes_host_pixels is False
    rng = np.random.RandomState(3)
    pred_u8 = rng.randint(0, 256, (4, 3, 32, 32), dtype=np.uint8)
    gt_u8 = rng.randint(0, 256, (4, 3, 32, 32), dtype=np.uint8)

    ev_host = SSIMEvaluator()
    ev_host.add_batch(pred=pred_u8.astype(np.float32) / 255.0,
                      gt=gt_u8.astype(np.float32) / 255.0)
    ev_dev = SSIMEvaluator()
    ev_dev.add_batch(pred=None, gt=None,
                     pred_dev=jnp.asarray(pred_u8), gt_dev=jnp.asarray(gt_u8))
    assert ev_dev.compute() == pytest.approx(ev_host.compute(), abs=1e-6)


def test_drain_skips_zero_row_and_host_chunks():
    """drain() fences the last DEVICE chunk; zero-row chunks (fully-padded
    batches → _apply_valid leaves 0 rows) and host numpy chunks (which on
    numpy>=2 also expose a .device attribute) must not crash it."""
    import jax.numpy as jnp
    pred, gt = _images(2)
    ev = PSNREvaluator()
    ev.add_batch(pred=pred, gt=gt)
    # a fully-invalid batch appends a 0-row numpy chunk
    ev.add_batch(pred=pred, gt=gt, valid=np.zeros(2, bool))
    ev.drain()  # must not IndexError on the empty chunk
    # device chunk followed by an empty one: drain fences the device chunk
    ev.data_psnr.append(jnp.zeros((0, 3)))
    ev.data_psnr.append(jnp.arange(6.0).reshape(2, 3))
    ev.data_psnr.append(np.zeros((0, 3)))
    ev.drain()


def test_ppl_vgg16_backbone_falls_back_to_alex(monkeypatch):
    """Setups provisioned only with the LPIPS-metric alex assets keep
    working when PPL's default vgg16 weights are absent (loud fallback,
    eval/ppl.py)."""
    import shgan_tpu.eval.lpips as lpips_mod
    from shgan_tpu.eval.ppl import PPLEvaluator

    calls = []

    def fake_resolve(net="alex", **kw):
        calls.append(net)
        if net == "vgg16":
            raise FileNotFoundError("no vgg16 assets")
        return {"stub": True}

    monkeypatch.setattr(lpips_mod, "resolve_lpips_params", fake_resolve)
    ev = PPLEvaluator()
    assert ev.net == "alex"
    assert calls == ["vgg16", "alex"]
    assert ev.lpips_params == {"stub": True}

    def none_resolve(net="alex", **kw):
        raise FileNotFoundError(f"no {net} assets")

    monkeypatch.setattr(lpips_mod, "resolve_lpips_params", none_resolve)
    with pytest.raises(FileNotFoundError, match="vgg16"):
        PPLEvaluator()


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


def test_detector_placement_guard(monkeypatch):
    """Params committed to a non-default backend are re-placed (the r3
    production-path regression: cpu-committed detector params silently
    moved the jitted Inception forward off the accelerator)."""
    from shgan_tpu.eval import detector as det_mod
    tree = {"a": {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}, "n": 3}
    # matching platform → identity (no transfer, no copy)
    same = det_mod._guard_placement(tree)
    assert same["a"]["w"] is tree["a"]["w"]
    # simulate a foreign default backend → every jax leaf re-placed
    monkeypatch.setattr(det_mod.jax, "default_backend", lambda: "nonsuch")
    healed = det_mod._guard_placement(tree)
    assert healed["a"]["w"] is not tree["a"]["w"]
    np.testing.assert_array_equal(np.asarray(healed["a"]["w"]),
                                  np.asarray(tree["a"]["w"]))
    assert healed["n"] == 3


@pytest.mark.slow
def test_inception_feature_shape(inception_params):
    x = np.random.RandomState(0).randint(
        0, 255, (2, 3, 64, 64)).astype(np.float32)
    f = np.asarray(inception_features(inception_params, x))
    assert f.shape == (2, 2048)
    assert np.isfinite(f).all()


@pytest.mark.slow
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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# wired feature-metric suite (kid / pr / is) + shared detector
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_feature_metrics_registered_path(tmp_path, inception_params,
                                         monkeypatch):
    """evaluator: [fid, kid, pr, is] from config → one shared Inception
    pass per batch array, all keys in result.json."""
    from shgan_tpu.eval.detector import InceptionDetector

    runs = []
    orig_run = InceptionDetector._run

    def counting_run(self, x, want_probs):
        runs.append(want_probs)
        return orig_run(self, x, want_probs)

    monkeypatch.setattr(InceptionDetector, "_run", counting_run)

    args = {"detector_params": inception_params}
    ev = get_evaluator([
        {"type": "fid", "args": args},
        {"type": "kid", "args": dict(args, num_subsets=4,
                                     max_subset_size=8)},
        {"type": "pr", "args": args},
        {"type": "is", "args": dict(args, num_splits=2)},
    ])
    rng = np.random.RandomState(2)
    fake = rng.randint(0, 255, (8, 3, 32, 32)).astype(np.float32)
    real = rng.randint(0, 255, (8, 3, 32, 32)).astype(np.float32)
    ev.add_batch(fake=fake, real=real)
    # one trunk pass each for fake and real — NOT 7 independent passes;
    # neither runs the head inline ('is' upgrades fake's memo entry with
    # the head-only matmul, real never touches the head)
    assert runs == [False, False]
    ev.set_sample_n(8)
    rv = ev.compute()
    assert np.isfinite(rv["fid"]) and np.isfinite(rv["kid"])
    assert 0 <= rv["pr"]["precision"] <= 1 and 0 <= rv["pr"]["recall"] <= 1
    assert rv["is"]["is_mean"] > 0
    path = ev.save(str(tmp_path))
    saved = json.load(open(path))
    assert set(saved) >= {"fid", "kid", "pr", "is"}


@pytest.mark.slow  # pays the inception_params fixture build
def test_detector_head_upgrade_matches_full_pass(inception_params):
    """features() never runs the classifier head (ADVICE r2: a plain FID
    run must not pay fc+softmax per batch); a later features_and_probs on
    the same array upgrades the memo with the head alone, matching the
    single-pass probs."""
    from shgan_tpu.eval.detector import InceptionDetector

    rng = np.random.RandomState(4)
    x = rng.randint(0, 255, (4, 3, 32, 32)).astype(np.float32)

    det = InceptionDetector(inception_params)
    feat = det.features(x)
    assert det._memo[-1][3] is None  # no probs computed for features()
    feat2, probs = det.features_and_probs(x)
    assert feat2 is feat  # memo hit, trunk not re-run

    det_full = InceptionDetector(inception_params)
    feat_full, probs_full = det_full.features_and_probs(x)
    np.testing.assert_allclose(feat, feat_full, rtol=0, atol=1e-5)
    np.testing.assert_allclose(probs, probs_full, rtol=0, atol=1e-6)


@pytest.mark.slow  # pays the 39 s inception_params fixture build
def test_pr_identical_sets_perfect(inception_params):
    from shgan_tpu.eval import PREvaluator
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 255, (8, 3, 32, 32)).astype(np.float32)
    ev = PREvaluator(detector_params=inception_params)
    ev.add_batch(fake=imgs, real=imgs)
    ev.set_sample_n(8)
    rv = ev.compute()
    assert rv["precision"] == 1.0 and rv["recall"] == 1.0


@pytest.mark.slow
def test_kid_shares_fid_real_cache(tmp_path, inception_params):
    """kid reuses the <tag>_real_feat.npy cache fid wrote."""
    from shgan_tpu.eval import KIDEvaluator
    rng = np.random.RandomState(4)
    fake = rng.randint(0, 255, (8, 3, 32, 32)).astype(np.float32)
    real = rng.randint(0, 255, (8, 3, 32, 32)).astype(np.float32)
    fid = FIDEvaluator(detector_params=inception_params,
                       dsstat_cachefile_tag="sharetag",
                       cache_dir=str(tmp_path))
    fid.add_batch(fake=fake, real=real)
    fid.set_sample_n(8)
    fid.compute()
    kid = KIDEvaluator(detector_params=inception_params,
                       dsstat_cachefile_tag="sharetag",
                       cache_dir=str(tmp_path), num_subsets=4,
                       max_subset_size=8)
    assert kid.dsstat_use_cache
    kid.add_batch(fake=fake, real=real)
    kid.set_sample_n(8)
    assert np.isfinite(kid.compute())


@pytest.mark.slow
def test_ppl_evaluator_generator_loop():
    """Registered PPL: contexts from add_batch, sampling loop over a tiny
    generator, tail-filtered mean is finite and non-negative."""
    from shgan_tpu.eval import PPLEvaluator
    from test_train import tiny_models

    G, _ = tiny_models(res=64)
    params = G.init(jax.random.key(0))
    lp = random_lpips_params(jax.random.key(1))
    ev = PPLEvaluator(num_samples=8, batch_size=4, space="w",
                      sampling="end", lpips_params=lp, net="alex")
    assert ev.needs_generator
    rng = np.random.RandomState(5)
    real = rng.randint(0, 255, (4, 3, 64, 64)).astype(np.float32)
    mask = (rng.rand(4, 1, 64, 64) > 0.5).astype(np.float32)
    ev.add_batch(real=real, mask=mask)
    ev.run_generator_metrics(G, params, seed=0)
    ev.set_sample_n(8)
    ppl = ev.compute()
    assert np.isfinite(ppl) and ppl >= 0

    # z-space + full sampling path also runs
    ev2 = PPLEvaluator(num_samples=4, batch_size=4, space="z",
                       sampling="full", lpips_params=lp, net="alex")
    ev2.add_batch(real=real, mask=mask)
    ev2.run_generator_metrics(G, params, seed=1)
    assert np.isfinite(ev2.compute())


@pytest.mark.slow
def test_compose_generator_metric_dispatch():
    from shgan_tpu.eval import PPLEvaluator
    from test_train import tiny_models

    G, _ = tiny_models(res=64)
    params = G.init(jax.random.key(0))
    lp = random_lpips_params(jax.random.key(1))
    ev = ComposeEvaluator([PSNREvaluator(),
                           PPLEvaluator(num_samples=4, batch_size=4,
                                        lpips_params=lp, net="alex")])
    assert ev.needs_generator
    rng = np.random.RandomState(6)
    real = rng.randint(0, 255, (4, 3, 64, 64)).astype(np.float32)
    mask = (rng.rand(4, 1, 64, 64) > 0.5).astype(np.float32)
    ev.add_batch(pred=real / 255.0, gt=real / 255.0, real=real, mask=mask)
    ev.run_generator_metrics(G, params, seed=0)
    ev.set_sample_n(4)
    rv = ev.compute()
    assert np.isfinite(rv["ppl"])


@pytest.mark.slow
def test_device_views_match_numpy_path(inception_params):
    """fake_dev/real_dev (device-to-device detector) and pred_dev/gt_dev
    (LPIPS) must score identically to the numpy hand-off."""
    import jax.numpy as jnp
    from shgan_tpu.eval import FIDEvaluator

    rng = np.random.RandomState(11)
    fake_u8 = rng.randint(0, 256, (4, 3, 64, 64), dtype=np.uint8)
    real = (rng.rand(4, 3, 64, 64).astype(np.float32) * 2) - 1

    fake_np = fake_u8.astype(np.float32)
    real_np255 = real * 127.5 + 127.5

    a = FIDEvaluator(detector_params=inception_params)
    a.add_batch(fake=fake_np, real=real_np255)
    b = FIDEvaluator(detector_params=inception_params)
    b.add_batch(fake=None, real=None,
                fake_dev=jnp.asarray(fake_u8).astype(jnp.float32),
                real_dev=jnp.asarray(real) * 127.5 + 127.5)
    a.set_sample_n(4)
    b.set_sample_n(4)
    np.testing.assert_allclose(np.concatenate(a.data_fake_feat),
                               np.concatenate(b.data_fake_feat),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.concatenate(a.data_real_feat),
                               np.concatenate(b.data_real_feat),
                               rtol=1e-5, atol=1e-5)

    lp = random_lpips_params(jax.random.key(1))
    la = LPIPSEvaluator(params=lp)
    la.add_batch(pred=fake_np / 255.0, gt=(real + 1) / 2)
    lb = LPIPSEvaluator(params=lp)
    lb.add_batch(pred=None, gt=None,
                 pred_dev=jnp.asarray(fake_u8).astype(jnp.float32) / 255.0,
                 gt_dev=(jnp.asarray(real) + 1) / 2)
    np.testing.assert_allclose(np.concatenate(la.data),
                               np.concatenate(lb.data),
                               rtol=1e-5, atol=1e-6)
