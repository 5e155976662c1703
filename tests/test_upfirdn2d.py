"""Parity tests for upfirdn2d / conv2d_resample against two oracles:

1. a from-the-spec numpy implementation (independent re-derivation of the
   documented contract), and
2. the reference PyTorch implementation running on CPU.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from shgan_tpu.ops import (
    setup_filter, upfirdn2d, filter2d, upsample2d, downsample2d,
    conv2d_resample,
)


# ---------------------------------------------------------------------------
# independent numpy oracle (written from the documented op contract)
# ---------------------------------------------------------------------------

def np_upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    upx, upy = up
    downx, downy = down
    if isinstance(padding, int):
        padding = [padding] * 2
    if len(padding) == 2:
        padding = [padding[0], padding[0], padding[1], padding[1]]
    px0, px1, py0, py1 = padding
    if f is None:
        f = np.ones((1, 1), dtype=np.float32)
    f = np.asarray(f, dtype=np.float64)
    if f.ndim == 1:
        f = np.outer(f, f) / 1.0 if False else f  # keep 1D handled below
    x = np.asarray(x, dtype=np.float64)
    N, C, H, W = x.shape

    # zero-insert upsample (zeros after each sample)
    y = np.zeros((N, C, H * upy, W * upx), dtype=np.float64)
    y[:, :, ::upy, ::upx] = x

    # signed pad
    y = np.pad(y, [(0, 0), (0, 0),
                   (max(py0, 0), max(py1, 0)),
                   (max(px0, 0), max(px1, 0))])
    y = y[:, :, max(-py0, 0): y.shape[2] - max(-py1, 0),
          max(-px0, 0): y.shape[3] - max(-px1, 0)]

    # filter (correlation with optionally flipped filter)
    if f.ndim == 1:
        fk = np.outer(f, f)  # only used when caller passes 2D in tests
        raise AssertionError("1D handled by caller in tests")
    fk = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        fk = fk[::-1, ::-1]
    fh, fw = fk.shape
    oh, ow = y.shape[2] - fh + 1, y.shape[3] - fw + 1
    out = np.zeros((N, C, oh, ow), dtype=np.float64)
    for i in range(fh):
        for j in range(fw):
            out += fk[i, j] * y[:, :, i:i + oh, j:j + ow]
    return out[:, :, ::downy, ::downx]


CASES = [
    dict(up=1, down=1, padding=0),
    dict(up=2, down=1, padding=1),
    dict(up=1, down=2, padding=1),
    dict(up=2, down=1, padding=[2, 1, 1, 2]),
    dict(up=1, down=1, padding=[-1, 2, 0, -2]),
    dict(up=2, down=2, padding=2),
    dict(up=(2, 1), down=(1, 2), padding=[1, 1, 2, 2]),
    dict(up=1, down=1, padding=0, flip_filter=True),
    dict(up=2, down=1, padding=2, gain=4.0),
]


@pytest.mark.parametrize("case", CASES)
def test_upfirdn2d_vs_numpy(case):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 8, 9).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    got = np.asarray(upfirdn2d(jnp.asarray(x), f, **case))
    want = np_upfirdn2d(x, f, **case)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_identity():
    x = np.random.RandomState(1).randn(1, 2, 5, 5).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), None))
    np.testing.assert_allclose(got, x, atol=0)


def test_upfirdn2d_separable():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 12, 12).astype(np.float32)
    f1 = setup_filter([1, 2, 4, 6, 6, 4, 2, 1])  # 8 taps → separable 1D
    assert f1.ndim == 1
    f2 = np.outer(f1, f1)
    got = np.asarray(upfirdn2d(jnp.asarray(x), f1, up=2, padding=2))
    want = np_upfirdn2d(x, f2, up=2, padding=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("case", CASES)
def test_upfirdn2d_vs_reference(ref, case):
    import torch
    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 8, 9).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    got = np.asarray(upfirdn2d(jnp.asarray(x), f, **case))
    want = ref.upfirdn2d._upfirdn2d_ref(
        torch.from_numpy(x), torch.from_numpy(np.asarray(f)), **case).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("fn,reffn", [
    (filter2d, "filter2d"), (upsample2d, "upsample2d"),
    (downsample2d, "downsample2d"),
])
def test_wrappers_vs_reference(ref, fn, reffn):
    import torch
    rng = np.random.RandomState(4)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    got = np.asarray(fn(jnp.asarray(x), f))
    want = getattr(ref.upfirdn2d, reffn)(
        torch.from_numpy(x), torch.from_numpy(np.asarray(f)), impl="ref").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# conv2d_resample parity (all dispatch paths)
# ---------------------------------------------------------------------------

RESAMPLE_CASES = [
    dict(k=1, up=1, down=2, groups=1, flip_weight=True),    # 1x1 + down
    dict(k=1, up=2, down=1, groups=1, flip_weight=True),    # 1x1 + up
    dict(k=3, up=1, down=2, groups=1, flip_weight=True),    # strided down
    dict(k=3, up=2, down=1, groups=1, flip_weight=False),   # transposed up
    dict(k=3, up=2, down=1, groups=1, flip_weight=True),
    dict(k=3, up=2, down=2, groups=1, flip_weight=False),   # up then down
    dict(k=3, up=1, down=1, groups=1, flip_weight=True, padding=1),  # plain
    dict(k=3, up=1, down=1, groups=1, flip_weight=False, padding=[0, 1, 1, 0]),
    dict(k=3, up=2, down=1, groups=2, flip_weight=False),   # grouped up
    dict(k=3, up=1, down=2, groups=2, flip_weight=True),    # grouped down
]


@pytest.mark.parametrize("case", RESAMPLE_CASES)
def test_conv2d_resample_vs_reference(ref, case):
    import torch
    case = dict(case)
    k = case.pop("k")
    groups = case["groups"]
    rng = np.random.RandomState(5)
    ic, oc = 4, 6
    x = rng.randn(2, ic, 8, 8).astype(np.float32)
    w = rng.randn(oc, ic // groups, k, k).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    got = np.asarray(
        conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=f, **case))
    want = ref.conv2d_resample.conv2d_resample(
        torch.from_numpy(x), torch.from_numpy(w),
        f=torch.from_numpy(np.asarray(f)), **case).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# matmul-FIR route (C <= 8): exact vs the depthwise-conv formulation
# ---------------------------------------------------------------------------

MATMUL_CASES = [
    dict(shape=(2, 3, 16, 16), up=2, padding=[2, 1, 2, 1], gain=4),
    dict(shape=(2, 3, 17, 13), up=2, padding=[2, 1, 2, 1], gain=4),
    dict(shape=(2, 3, 16, 16), down=2, padding=[1, 1, 1, 1]),
    dict(shape=(2, 4, 16, 16), padding=[2, 1, 2, 1]),
    dict(shape=(2, 3, 16, 16), up=2, padding=[-1, 2, 3, -2], gain=4),
    dict(shape=(1, 1, 8, 8), up=4, down=2, padding=[3, 3, 3, 3], gain=16),
    dict(shape=(2, 3, 16, 16), up=2, padding=[2, 1, 2, 1], gain=4,
         flip_filter=True),
]


@pytest.mark.parametrize("case", MATMUL_CASES)
def test_fir_matmul_route_exact(case, monkeypatch):
    """The banded-matmul formulation for low-channel tensors (the 3-channel
    img pyramid runs 8-12 GB/s effective under the depthwise-conv tiling —
    xprof 2026-08-19) must be exact vs the conv formulation."""
    import importlib
    M = importlib.import_module("shgan_tpu.ops.upfirdn2d")
    monkeypatch.setattr(M, "_FIR_MATMUL_MIN_HW", 0)  # small test shapes
    case = dict(case)
    shape = case.pop("shape")
    x = jnp.asarray(np.random.RandomState(7).randn(*shape).astype(np.float32))
    f = setup_filter((1, 3, 3, 1))
    monkeypatch.setenv("SHGAN_FIR_MATMUL", "0")
    want = np.asarray(upfirdn2d(x, f, **case))
    monkeypatch.setenv("SHGAN_FIR_MATMUL", "1")
    got = np.asarray(upfirdn2d(x, f, **case))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_fir_matmul_separable_1d(monkeypatch):
    import importlib
    M = importlib.import_module("shgan_tpu.ops.upfirdn2d")
    monkeypatch.setattr(M, "_FIR_MATMUL_MIN_HW", 0)
    x = jnp.asarray(np.random.RandomState(8).randn(2, 4, 16, 16)
                    .astype(np.float32))
    f = setup_filter(np.ones(8))  # 1D separable
    monkeypatch.setenv("SHGAN_FIR_MATMUL", "0")
    want = np.asarray(upfirdn2d(x, f, up=2, padding=[5, 3, 5, 3], gain=4))
    monkeypatch.setenv("SHGAN_FIR_MATMUL", "1")
    got = np.asarray(upfirdn2d(x, f, up=2, padding=[5, 3, 5, 3], gain=4))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_fir_matmul_gating(monkeypatch):
    """C > 8 or small spatial extents keep the depthwise-conv formulation
    (the matmul inflation only pays where the conv tiling wastes lanes AND
    the op is big enough — up 128->256 measured 0.89x, bench_fir3.py)."""
    import importlib
    M = importlib.import_module("shgan_tpu.ops.upfirdn2d")
    calls = []
    orig = M._fir_matmul
    monkeypatch.setattr(M, "_fir_matmul",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    monkeypatch.setenv("SHGAN_FIR_MATMUL", "1")
    monkeypatch.setattr(M, "_FIR_MATMUL_MIN_HW", 16)
    f = setup_filter((1, 3, 3, 1))
    x3 = jnp.zeros((1, 3, 8, 8), jnp.float32)
    x16 = jnp.zeros((1, 16, 8, 8), jnp.float32)
    # up: 8*2 = 16 >= 16 -> routed
    M.upfirdn2d(x3, f, up=2, padding=[2, 1, 2, 1], gain=4)
    assert calls == [1]
    # C too high -> conv route
    M.upfirdn2d(x16, f, up=2, padding=[2, 1, 2, 1], gain=4)
    assert calls == [1]
    # down: input extent 8 < 16 -> conv route
    M.upfirdn2d(x3, f, down=2, padding=[1, 1, 1, 1])
    assert calls == [1]
    # down from 16 -> routed
    x3b = jnp.zeros((1, 3, 16, 16), jnp.float32)
    M.upfirdn2d(x3b, f, down=2, padding=[1, 1, 1, 1])
    assert calls == [1, 1]
