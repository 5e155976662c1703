"""Parity tests for the spectral subsystem (cweight basis, Gaussian-split
maps, heterogeneous filter) against the reference on CPU."""

import numpy as np
import pytest
import jax.numpy as jnp

from shgan_tpu.spectral import (
    make_cweight, grid_sample_2d, gaussian_heatmap_2d,
    build_gaussian_split_maps, heterogeneous_filter_apply,
    spectral_shift, spectral_unshift,
)


@pytest.mark.parametrize("typ", ["piecewise_linear", "bicubic"])
@pytest.mark.parametrize("half_size,half_sample", [
    ([2, 3], [64, 33]),   # the shgan_e256 config (freedom=[2,3], input 64)
    ([3, 2], [16, 9]),
    ([2, 3], [15, 9]),    # odd hs → non-aligned grid branch
])
def test_make_cweight_vs_reference(ref, typ, half_size, half_sample):
    got = make_cweight(half_size, half_sample, type=typ)
    want = ref.shgan.make_cweight(half_size, half_sample, type=typ).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_sample_vs_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    inp = rng.randn(3, 5, 7).astype(np.float32)
    gx = rng.uniform(-1, 1, (6, 8))
    gy = rng.uniform(-1, 1, (6, 8))
    grid = np.stack([gx, gy], axis=-1).astype(np.float32)
    for mode in ("bilinear", "bicubic"):
        got = grid_sample_2d(inp, grid, mode=mode)
        want = F.grid_sample(
            torch.from_numpy(inp)[None], torch.from_numpy(grid)[None],
            mode=mode, padding_mode="border", align_corners=True)[0].numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gaussian_heatmap_vs_reference(ref):
    size = (32, 17)
    c = np.array([[15.0, 0.0]])
    sigma = 16 / 3
    v = np.array([[[sigma ** 2, 0], [0, sigma ** 2]]])
    got = gaussian_heatmap_2d(size, c, v)
    want = ref.shgan.gaussian_heatmap_2d(size=list(size))(c=c, v=v)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("gaussian_at_input_res", [False, True])
def test_gaussian_split_maps_vs_reference(ref, gaussian_at_input_res):
    import torch
    shu = ref.shgan.SHU(4, 4, input_res=64, lowest_res=4, tail_sigma_mult=3,
                        gaussian_at_input_res=gaussian_at_input_res)
    got = build_gaussian_split_maps(
        64, lowest_res=4, tail_sigma_mult=3,
        gaussian_at_input_res=gaussian_at_input_res)
    assert set(got) == set(shu.gaussian_weight_map)
    for res, want in shu.gaussian_weight_map.items():
        np.testing.assert_allclose(got[res], want.numpy(), rtol=1e-6,
                                   atol=1e-6, err_msg=f"res={res}")


def test_heterogeneous_filter_vs_reference(ref):
    import torch
    rng = np.random.RandomState(1)
    # the reference's view(bs, c, -1, h, w) at shgan.py:158 only supports
    # in_channels == out_channels (as used by SHU)
    ic, oc, F_ = 4, 4, 6
    hf = ref.shgan.heterogeneous_filter(ic, oc, freedom=[2, 3],
                                        type="piecewise_linear")
    with torch.no_grad():
        hf.weight.copy_(torch.from_numpy(
            rng.randn(ic, oc * F_).astype(np.float32)))
    x = rng.randn(2, ic, 16, 9).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(x)).numpy()
    cw = make_cweight([2, 3], [16, 9], type="piecewise_linear")
    got = np.asarray(heterogeneous_filter_apply(
        jnp.asarray(hf.weight.detach().numpy()), jnp.asarray(x), cw, oc))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_spectral_shift_roundtrip(ref):
    """shift→unshift must be the identity at the same resolution, and the
    shift must match the reference's concat convention."""
    import torch
    rng = np.random.RandomState(2)
    for h in (8, 16):
        x = rng.randn(1, 2, h, h // 2 + 1).astype(np.float32)
        got = np.asarray(spectral_shift(jnp.asarray(x)))
        t = torch.from_numpy(x)
        want = torch.cat([t[:, :, h // 2 + 1:], t[:, :, :h // 2 + 1]],
                         dim=2).numpy()
        np.testing.assert_array_equal(got, want)
        back = np.asarray(spectral_unshift(jnp.asarray(got), h))
        np.testing.assert_array_equal(back, x)
