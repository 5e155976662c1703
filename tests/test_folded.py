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
from shgan_tpu.ops.upfirdn2d import setup_filter

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


# ---------------------------------------------------------------------------
# end-to-end: full SH-GAN generator with folded top levels ≡ direct
# ---------------------------------------------------------------------------

def _gen_pair(fold_above_res):
    import copy
    from test_models_parity import _tiny_generator_cfg
    from shgan_tpu.models import get_model

    cfg = _tiny_generator_cfg()
    cfg2 = copy.deepcopy(cfg)
    cfg2["args"]["encoder"]["args"]["fold_above_res"] = fold_above_res
    cfg2["args"]["synthesis"]["args"]["fold_above_res"] = fold_above_res
    return get_model(cfg), get_model(cfg2)


@pytest.mark.slow
@pytest.mark.parametrize("noise_mode", ["const", "random"])
def test_generator_folded_exact(noise_mode):
    """Folding the two top levels (128², 256² — including the
    folded→folded handoffs, the SHU folded hint add, and the folded img
    pyramid) must reproduce the direct path to float tolerance, with
    BIT-identical noise draws in 'random' mode (fine noise is drawn
    identically, then folded)."""
    g, gf = _gen_pair(64)
    params = g.init(jax.random.key(0))
    rng = np.random.RandomState(3)
    N = 2
    real = rng.randn(N, 3, 256, 256).astype(np.float32)
    mask = (rng.rand(N, 1, 256, 256) > 0.4).astype(np.float32)
    x = jnp.asarray(np.concatenate([mask - 0.5, real * mask], axis=1))
    z = jnp.asarray(rng.randn(N, 64).astype(np.float32))

    kw = dict(noise_mode=noise_mode)
    if noise_mode == "random":
        kw["rng"] = jax.random.key(7)
    want = np.asarray(g(params, x, z, **kw))
    got = np.asarray(gf(params, x, z, **kw))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-4)


@pytest.mark.slow
def test_shgan_encoder_folded_hint_add():
    """SHU hints landing on a FOLDED level (possible when shu_input_res
    exceeds the fold threshold) must add into the last shu_channels of
    the fine layout — i.e. the last channels of each per-phase block."""
    from test_models_parity import _tiny_generator_cfg
    from shgan_tpu.models.shgan_encoder import ShganEncoder
    from shgan_tpu.ops.folded import unfold

    enc_args = dict(_tiny_generator_cfg()["args"]["encoder"]["args"])
    enc_args["shu_input_res"] = 128   # hints now reach res 128 (folded)
    e = ShganEncoder(**enc_args)
    ef = ShganEncoder(**{**enc_args, "fold_above_res": 64})
    params = e.init(jax.random.key(0))
    img = randn(20, (2, 4, 256, 256))
    x, feats = e(params, img)
    xf, featsf = ef(params, img)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(x),
                               rtol=0, atol=2e-4)
    for res in feats:
        got = featsf[res]
        if res > 64:
            got = unfold(got)
        np.testing.assert_allclose(np.asarray(got), np.asarray(feats[res]),
                                   rtol=0, atol=2e-4, err_msg=f"res={res}")


@pytest.mark.slow
@pytest.mark.parametrize("enc_f,syn_f", [(64, None), (None, 64), (64, 128)])
def test_generator_mixed_fold_scopes_exact(enc_f, syn_f):
    """Encoder and synthesis may fold with DIFFERENT thresholds
    (SHGAN_FOLD_SCOPE=enc|syn); CoModGANGenerator._match_fold_layout
    re-lays the skip features at disagreeing levels.  Must reproduce the
    unfolded forward to float tolerance."""
    import copy
    from test_models_parity import _tiny_generator_cfg
    from shgan_tpu.models import get_model

    cfg = _tiny_generator_cfg()
    cfg2 = copy.deepcopy(cfg)
    cfg2["args"]["encoder"]["args"]["fold_above_res"] = enc_f
    cfg2["args"]["synthesis"]["args"]["fold_above_res"] = syn_f
    g, gm = get_model(cfg), get_model(cfg2)
    params = g.init(jax.random.key(0))
    rng = np.random.RandomState(5)
    N = 2
    real = rng.randn(N, 3, 256, 256).astype(np.float32)
    mask = (rng.rand(N, 1, 256, 256) > 0.4).astype(np.float32)
    x = jnp.asarray(np.concatenate([mask - 0.5, real * mask], axis=1))
    z = jnp.asarray(rng.randn(N, 64).astype(np.float32))
    want = np.asarray(g(params, x, z, noise_mode="const"))
    got = np.asarray(gm(params, x, z, noise_mode="const"))
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-4)
