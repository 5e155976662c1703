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


@pytest.mark.parametrize("res", [299, 256])
def test_port_parity_random_weights(res):
    sd = random_inception_state_dict(seed=0)
    params = load_inception_params(sd)
    x = fixed_batch(2, res)
    jf = np.asarray(inception_features(params, jnp.asarray(
        x.astype(np.float32))), np.float64)
    tf = torch_pth_features(x, sd=sd)
    assert np.abs(jf - tf).max() <= (1e-3 if res == 299 else 2e-3)


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
def test_port_parity_real_weights(res):
    params = load_inception_params(os.environ["SHGAN_TPU_INCEPTION"])
    x = fixed_batch(4, res)
    jf = np.asarray(inception_features(params, jnp.asarray(
        x.astype(np.float32))), np.float64)
    tf = torch_pth_features(x)
    assert np.abs(jf - tf).max() <= 1e-3


@pytest.mark.skipif(not (_HAVE_PTH and _HAVE_TS),
                    reason="reference TorchScript detector not present "
                           "(docs/ASSETS.md)")
def test_reference_torchscript_parity_299():
    from validate_fid import torchscript_features
    params = load_inception_params(os.environ["SHGAN_TPU_INCEPTION"])
    x = fixed_batch(4, 299)
    jf = np.asarray(inception_features(params, jnp.asarray(
        x.astype(np.float32))), np.float64)
    sf = torchscript_features(x)
    assert np.abs(jf - sf).max() <= 1e-2
