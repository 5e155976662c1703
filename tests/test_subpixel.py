"""Phase-decomposed up-conv (ops/subpixel.py): exactness vs the
lhs_dilation conv it replaces, dispatch gating, and grad flow.

Reference contract: the up>1 path of
`/root/reference/lib/model_zoo/stylegan_utils/conv2d_resample.py:122-142`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

import shgan_tpu.ops.subpixel as sp
import shgan_tpu.ops.conv_resample as cr

pytestmark = pytest.mark.quick


def _up_xla(x, w, p):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(p[0], p[0]), (p[1], p[1])], lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


@pytest.mark.parametrize("pyt,pxt", [(0, 0), (1, 1), (2, 2), (0, 2)])
@pytest.mark.parametrize("h,wd", [(8, 8), (7, 9)])
def test_phase_matches_dilated_conv(pyt, pxt, h, wd):
    rng = np.random.RandomState(pyt * 10 + h)
    x = jnp.asarray(rng.randn(2, 5, h, wd).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 5, 3, 3).astype(np.float32))
    want = _up_xla(x, w, (2 - pyt, 2 - pxt))
    got = sp.conv2d_up_phase(x, w, (pyt, pxt))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)


def test_dispatch_routes_and_matches(monkeypatch):
    """set_subpixel_impl('phase') routes up=2 k=3 convs in conv_resample
    (including the FIR/padding algebra around them) and stays numerically
    identical; 1×1 and grouped kernels keep the XLA path."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 6, 12, 12).astype(np.float32))
    w = jnp.asarray(rng.randn(6, 6, 3, 3).astype(np.float32) * 0.2)
    f = jnp.asarray([1.0, 3.0, 3.0, 1.0])
    f = jnp.outer(f, f) / 64.0
    want = cr.conv2d_resample(x, w, f=f, up=2, padding=1)
    monkeypatch.setattr(sp, "_IMPL", "phase")
    assert sp.subpixel_eligible(w.shape, 2, (0, 0), 1)
    assert not sp.subpixel_eligible((6, 6, 1, 1), 2, (0, 0), 1)
    assert not sp.subpixel_eligible(w.shape, 2, (0, 0), 2)
    assert not sp.subpixel_eligible(w.shape, 1, (0, 0), 1)
    got = cr.conv2d_resample(x, w, f=f, up=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)

    # env override pins the impl off regardless of the runtime switch
    monkeypatch.setenv("SHGAN_SUBPIXEL", "xla")
    sp.set_subpixel_impl("phase")
    assert not sp.subpixel_eligible(w.shape, 2, (0, 0), 1)
    monkeypatch.delenv("SHGAN_SUBPIXEL")
    sp.set_subpixel_impl("xla")


def test_phase_grad_matches(monkeypatch):
    """The decomposition is plain convs/reshapes — jax.grad through it
    equals grad through the dilated conv (training-eligible, unlike the
    Pallas kernels)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 3, 3).astype(np.float32) * 0.3)

    def loss_xla(w):
        return jnp.sum(_up_xla(x, w, (2, 2)) ** 2)

    def loss_phase(w):
        return jnp.sum(sp.conv2d_up_phase(x, w, (0, 0)) ** 2)

    gx = jax.grad(loss_xla)(w)
    gp = jax.grad(loss_phase)(w)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=1e-3, rtol=1e-4)
