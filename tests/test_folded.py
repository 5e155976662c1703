"""Exactness of the space-to-depth folded conv path (ops/folded.py).

Every folded primitive is an exact linear-algebra rearrangement of the
corresponding direct op in ops/conv_resample.py / ops/upfirdn2d.py; these
tests pin that equivalence to float tolerance on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shgan_tpu.ops import folded as F
from shgan_tpu.ops.conv_resample import conv2d_resample, _maybe_flip
from shgan_tpu.ops.upfirdn2d import setup_filter, upsample2d

pytestmark = pytest.mark.quick

FILT = setup_filter((1, 3, 3, 1))


def randn(key, shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


def test_fold_unfold_roundtrip():
    x = randn(0, (2, 3, 8, 6))
    np.testing.assert_array_equal(F.unfold(F.fold(x)), x)


def test_fold_layout_phase_major():
    # X[:, p*C+c, y, x] == x[:, c, 2y+pi, 2x+pj]
    x = randn(1, (1, 2, 4, 4))
    xf = F.fold(x)
    for pi in range(2):
        for pj in range(2):
            p = pi * 2 + pj
            for c in range(2):
                np.testing.assert_array_equal(
                    xf[0, p * 2 + c], x[0, c, pi::2, pj::2])


@pytest.mark.parametrize("variant", ["A", "B"])
def test_conv_s1_folded(variant):
    x = randn(2, (2, 6, 16, 12))
    w = randn(3, (5, 6, 3, 3)) * 0.3
    ref = conv2d_resample(x, w, f=None, padding=1)
    got = F.unfold(F.conv_s1_folded(F.fold(x), w, variant=variant))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_conv_down_folded():
    x = randn(4, (2, 6, 16, 12))
    w = randn(5, (7, 6, 3, 3)) * 0.3
    ref = conv2d_resample(x, w, f=FILT, down=2, padding=1)
    got = F.conv_down_folded(F.fold(x), w, FILT)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_conv_up_folded():
    x = randn(6, (2, 6, 8, 6))
    # conv2d_resample takes [O, I, kh, kw]; the SynthesisLayer up path
    # uses flip_weight=False, so the folded op receives the flipped w'
    w = randn(7, (5, 6, 3, 3)) * 0.3
    ref = conv2d_resample(x, w, f=FILT, up=2, padding=1, flip_weight=False)
    wp = _maybe_flip(w, False)
    got = F.unfold(F.conv_up_folded(x, wp, FILT))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_upsample2d_folded():
    img = randn(8, (2, 3, 8, 6))
    ref = F.fold(upsample2d(img, FILT))
    got = F.upsample2d_folded(img, FILT)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_conv_1x1_folded():
    x = randn(9, (2, 6, 8, 6))
    w = randn(10, (4, 6, 1, 1)) * 0.3
    ref = F.fold(conv2d_resample(x, w, f=None, padding=0))
    got = F.conv_1x1_folded(F.fold(x), w)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_fold_noise_matches_fold():
    n = randn(11, (2, 1, 8, 8))
    np.testing.assert_array_equal(
        F.fold_noise(n[:, 0]), F.fold(n)[:, :, :, :].reshape(2, 4, 4, 4))


def test_tile_channel_vec_matches_layout():
    x = randn(12, (1, 3, 4, 4))
    b = jnp.asarray([1.0, 2.0, 3.0])
    ref = F.fold(x + b[None, :, None, None])
    got = F.fold(x) + F.tile_channel_vec(b)[None, :, None, None]
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)
