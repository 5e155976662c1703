"""Parity tests for modulated_conv2d, dense, lrelu_agc, minibatch_std
against the reference PyTorch implementation on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from shgan_tpu.ops import (
    modulated_conv2d, setup_filter, lrelu_agc, get_activation,
    dense_init, dense_apply, minibatch_std,
)


MODCONV_CASES = [
    dict(k=3, up=1, demodulate=True, flip_weight=True, padding=1),
    dict(k=3, up=2, demodulate=True, flip_weight=False, padding=1),
    dict(k=1, up=1, demodulate=False, flip_weight=True, padding=0),  # torgb
    dict(k=3, up=1, demodulate=True, flip_weight=True, padding=1, noise=True),
    dict(k=3, up=2, demodulate=True, flip_weight=False, padding=1, noise=True),
]


@pytest.mark.parametrize("case", MODCONV_CASES)
@pytest.mark.parametrize("ref_fused", [True, False])
def test_modulated_conv2d_vs_reference(ref, case, ref_fused):
    """Our single einsum-demodulated path must match BOTH reference paths
    (they are mathematically identical, stylegan.py:149-193)."""
    import torch
    case = dict(case)
    k = case.pop("k")
    use_noise = case.pop("noise", False)
    rng = np.random.RandomState(7)
    N, I, O, H = 2, 4, 6, 8
    x = rng.randn(N, I, H, H).astype(np.float32)
    w = rng.randn(O, I, k, k).astype(np.float32)
    s = rng.randn(N, I).astype(np.float32)
    up = case["up"]
    noise = rng.randn(N, O, H * up, H * up).astype(np.float32) if use_noise else None
    f = setup_filter([1, 3, 3, 1]) if up > 1 else None

    got = np.asarray(modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
        noise=None if noise is None else jnp.asarray(noise),
        resample_filter=f, **case))

    want = ref.stylegan.modulated_conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(s),
        noise=None if noise is None else torch.from_numpy(noise),
        resample_filter=None if f is None else torch.from_numpy(np.asarray(f)),
        fused_modconv=ref_fused, **case).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_lrelu_agc_vs_reference(ref):
    import torch
    x = np.linspace(-600, 600, 101).astype(np.float32)
    act = ref.stylegan.utils.get_unit()(
        "lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)")()
    want = act(torch.from_numpy(x.copy()), gain=0.7071).numpy()
    got = np.asarray(lrelu_agc(jnp.asarray(x), alpha=0.2,
                               gain=np.sqrt(2), clamp=256, extra_gain=0.7071))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # string-spec factory path
    fn = get_activation("lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)")
    got2 = np.asarray(fn(jnp.asarray(x), gain=0.7071))
    np.testing.assert_allclose(got2, want, rtol=1e-6, atol=1e-6)


def test_dense_vs_reference(ref):
    import torch
    rng = np.random.RandomState(9)
    x = rng.randn(3, 16).astype(np.float32)
    layer = ref.stylegan.dense(16, 8, bias=True, bias_init=1.0,
                               activation="lrelu_agc(alpha=0.2, gain=sqrt_2)",
                               lr_multi=0.01)
    with torch.no_grad():
        want = layer(torch.from_numpy(x)).numpy()
    params = {
        "weight": jnp.asarray(layer.weight.detach().numpy()),
        "bias": jnp.asarray(layer.bias.detach().numpy()),
    }
    got = np.asarray(dense_apply(
        params, jnp.asarray(x), lr_multi=0.01,
        activation="lrelu_agc(alpha=0.2, gain=sqrt_2)"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dense_init_shapes():
    p = dense_init(jax.random.key(0), 16, 8, bias=True, bias_init=1.0,
                   lr_multi=0.01)
    assert p["weight"].shape == (8, 16)
    assert p["bias"].shape == (8,)
    np.testing.assert_allclose(np.asarray(p["bias"]), 1.0)
    # init std scales as 1/lr_multi (stylegan.py:80)
    assert 50 < np.std(np.asarray(p["weight"])) < 150


@pytest.mark.parametrize("group_size,num_channels", [(4, 1), (2, 2), (None, 1)])
def test_minibatch_std_vs_reference(ref, group_size, num_channels):
    import torch
    rng = np.random.RandomState(11)
    x = rng.randn(4, 6, 5, 5).astype(np.float32)
    layer = ref.stylegan.minibatch_std_layer(group_size, num_channels)
    with torch.no_grad():
        want = layer(torch.from_numpy(x)).numpy()
    got = np.asarray(minibatch_std(jnp.asarray(x), group_size, num_channels))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
