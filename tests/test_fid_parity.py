"""FID-detector parity: the JAX InceptionV3 port vs torch oracles.

Three tiers (tools/validate_fid.py is the runnable counterpart):
  1. Port parity with RANDOM weights — runs everywhere, no assets: the same
     state_dict through our loader/graph and a from-scratch torch graph.
     Validates topology, padding/stride, BN folding, pooling quirks, and
     the 299² resize.
  2. Port parity with the real pt_inception weights (skipped unless
     ``SHGAN_TPU_INCEPTION`` is set — docs/ASSETS.md).
  3. Parity with the reference's actual TorchScript detector (skipped
     unless ``SHGAN_TPU_INCEPTION_TS`` is set), cf. eva_fid.py:21.
"""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from shgan_tpu.eval.inception import (inception_features,
                                      inception_features_and_probs,
                                      load_inception_params,
                                      random_inception_state_dict)
from validate_fid import fixed_batch, torch_pth_features

_HAVE_PTH = os.path.isfile(os.environ.get("SHGAN_TPU_INCEPTION", ""))
_HAVE_TS = os.path.isfile(os.environ.get("SHGAN_TPU_INCEPTION_TS", ""))


@pytest.mark.slow  # quick-tier coverage of the same claim lives in
# test_fid_fixture.py::test_random_fixture_pins_port_parity (committed
# fixture, no torch recompute); this runtime torch-vs-jax recompute stays
# in the full tier as the stronger oracle
@pytest.mark.parametrize("res", [299, 256])
@pytest.mark.parametrize("policy", ["ts", "bilinear"])
def test_port_parity_random_weights(res, policy):
    sd = random_inception_state_dict(seed=0)
    params = load_inception_params(sd)
    x = fixed_batch(2, res)
    jf = np.asarray(inception_features(params, jnp.asarray(
        x.astype(np.float32)), resize_policy=policy), np.float64)
    tf = torch_pth_features(x, sd=sd, resize_policy=policy)
    assert np.abs(jf - tf).max() <= (1e-3 if res == 299 else 2e-3)


@pytest.mark.parametrize("res", [256, 299, 512])
def test_ts_resize_matches_torchscript_grid_sample(res):
    """The 'ts' resize (static separable matmuls) is numerically the
    affine_grid/grid_sample kernel the NVIDIA TorchScript detector runs
    internally (theta[d,2] += 1/in − 1/299) — checked on raw pixels, the
    sharpest test of the policy itself."""
    from validate_fid import torch_ts_resize
    import torch
    from shgan_tpu.eval.inception import _resize_299
    x = fixed_batch(2, res).astype(np.float32)
    ours = np.asarray(_resize_299(jnp.asarray(x), "ts"))
    ref = torch_ts_resize(torch.from_numpy(x)).numpy()
    assert ours.shape == ref.shape == (2, 3, 299, 299)
    # f32 rounding only: grid_sample goes through normalized coords, the
    # matmul form doesn't — ~1e-3 on 0..255 pixel values is ~4e-9 relative
    assert np.abs(ours - ref).max() <= 3e-3


def test_ts_resize_is_tf_asymmetric_mapping():
    """src = dst * in/out exactly: a linear ramp resampled under the 'ts'
    policy reproduces the analytic TF1 resize_bilinear values."""
    h = 7
    ramp = np.arange(h, dtype=np.float32)
    x = np.broadcast_to(ramp[None, None, :, None], (1, 3, h, h)).copy()
    out = np.asarray(_resize299_for_test(x))
    i = np.arange(299)
    expect = np.minimum(i * h / 299.0, h - 1)
    np.testing.assert_allclose(out[0, 0, :, 0], expect, atol=1e-4)


def _resize299_for_test(x):
    from shgan_tpu.eval.inception import _resize_299
    return _resize_299(jnp.asarray(x), "ts")


def test_probs_head_from_state_dict():
    sd = random_inception_state_dict(seed=1)
    params = load_inception_params(sd)
    x = fixed_batch(2, 64)
    _, probs = inception_features_and_probs(params, jnp.asarray(
        x.astype(np.float32)))
    probs = np.asarray(probs)
    assert probs.shape == (2, 1008)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)


@pytest.mark.skipif(not _HAVE_PTH,
                    reason="SHGAN_TPU_INCEPTION weights not present "
                           "(docs/ASSETS.md)")
@pytest.mark.parametrize("res", [299, 256, 512])
@pytest.mark.parametrize("policy", ["ts", "bilinear"])
def test_port_parity_real_weights(res, policy):
    params = load_inception_params(os.environ["SHGAN_TPU_INCEPTION"])
    x = fixed_batch(4, res)
    jf = np.asarray(inception_features(params, jnp.asarray(
        x.astype(np.float32)), resize_policy=policy), np.float64)
    tf = torch_pth_features(x, resize_policy=policy)
    assert np.abs(jf - tf).max() <= 1e-3


@pytest.mark.skipif(not (_HAVE_PTH and _HAVE_TS),
                    reason="reference TorchScript detector not present "
                           "(docs/ASSETS.md)")
@pytest.mark.parametrize("res", [299, 256, 512])
def test_reference_torchscript_parity(res):
    """vs the reference's ACTUAL detector, at every resolution — the 'ts'
    policy closes the internal-resize gap, so downsampled inputs are
    asserted too (r3 only asserted 299²)."""
    from validate_fid import torchscript_features
    params = load_inception_params(os.environ["SHGAN_TPU_INCEPTION"])
    x = fixed_batch(4, res)
    jf = np.asarray(inception_features(params, jnp.asarray(
        x.astype(np.float32)), resize_policy="ts"), np.float64)
    sf = torchscript_features(x)
    assert np.abs(jf - sf).max() <= 1e-2
