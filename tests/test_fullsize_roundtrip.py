"""Full-size checkpoint round-trip: the released shgan_g256 architecture
(channel plan ch_base=32768/ch_max=512, oc_n=1024 — reference
configs/model/comodgan.yaml:19-49 + shgan.yaml:5-45), built in the
reference torch code, saved as a .pth state_dict, loaded through the
torch-free reader + converter into the full-size JAX model from our config
bank, forward-compared at 256² with noise_mode='const'.

This exercises the real key space (b4…b256, fc0…fc7, noise_const, w_avg)
at released width — the north-star parity claim (≤1e-3 per-pixel,
BASELINE.json) at the architecture users actually load
(`/root/reference/lib/experiments/shgan_default.py:221-226`)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from shgan_tpu.models import get_model
from shgan_tpu.checkpoint import load_torch_pth, torch_state_dict_to_params
from shgan_tpu.runtime.config import model_cfg_bank
from shgan_tpu.runtime.stages import _merge_params

pytestmark = pytest.mark.slow


def test_fullsize_shgan_g256_pth_roundtrip(ref, tmp_path):
    cfg = model_cfg_bank()("shgan_g256")

    # build the identical architecture in the reference torch code
    tm = ref.stylegan.Mapping(**cfg["args"]["mapping"]["args"]).eval()
    tenc = ref.shgan.Encoder(**cfg["args"]["encoder"]["args"]).eval()
    tsyn = ref.comodgan.Synthesis(**cfg["args"]["synthesis"]["args"]).eval()
    tg = ref.comodgan.Generator(tm, tenc, tsyn).eval()

    # released .pth layout: save_state_dict of the whole generator
    # (reference get_model.py:24-29)
    path = tmp_path / "shgan_g256.pth"
    torch.save(tg.state_dict(), str(path))

    g = get_model(cfg)
    params = g.init(jax.random.key(0))
    loaded = torch_state_dict_to_params(load_torch_pth(str(path)))
    # strict merge: every released key must land, every model param must
    # be covered (strict_sd=true semantics, shgan_default.py:221-226)
    params = _merge_params(params, loaded, strict=True)

    rng = np.random.RandomState(0)
    N = 1
    real = rng.randn(N, 3, 256, 256).astype(np.float32)
    mask = (rng.rand(N, 1, 256, 256) > 0.4).astype(np.float32)
    x = np.concatenate([mask - 0.5, real * mask], axis=1)
    z = rng.randn(N, 512).astype(np.float32)
    c = np.zeros((N, 0), dtype=np.float32)

    with torch.no_grad():
        want = tg(torch.from_numpy(x), torch.from_numpy(z),
                  torch.from_numpy(c), noise_mode="const").numpy()

    fwd = jax.jit(lambda p, x, z: g(p, x, z, noise_mode="const"))
    got = np.asarray(fwd(params, jnp.asarray(x), jnp.asarray(z)))

    assert got.shape == want.shape == (N, 3, 256, 256)
    err = np.abs(got - want).max()
    assert err < 1e-3, f"max abs err {err} (north star: <=1e-3)"


def test_fullsize_shgan_g512_pth_roundtrip(ref, tmp_path):
    """Same round-trip at the 512² released architecture — the b512 key
    space, num_ws=16 and the 512-level channel plan
    (`/root/reference/configs/model/comodgan.yaml:36-49`) at the
    resolution the headline throughput metric quotes."""
    cfg = model_cfg_bank()("shgan_g512")

    tm = ref.stylegan.Mapping(**cfg["args"]["mapping"]["args"]).eval()
    tenc = ref.shgan.Encoder(**cfg["args"]["encoder"]["args"]).eval()
    tsyn = ref.comodgan.Synthesis(**cfg["args"]["synthesis"]["args"]).eval()
    tg = ref.comodgan.Generator(tm, tenc, tsyn).eval()

    path = tmp_path / "shgan_g512.pth"
    torch.save(tg.state_dict(), str(path))

    g = get_model(cfg)
    params = g.init(jax.random.key(0))
    loaded = torch_state_dict_to_params(load_torch_pth(str(path)))
    params = _merge_params(params, loaded, strict=True)

    rng = np.random.RandomState(1)
    N = 1
    real = rng.randn(N, 3, 512, 512).astype(np.float32)
    mask = (rng.rand(N, 1, 512, 512) > 0.4).astype(np.float32)
    x = np.concatenate([mask - 0.5, real * mask], axis=1)
    z = rng.randn(N, 512).astype(np.float32)
    c = np.zeros((N, 0), dtype=np.float32)

    with torch.no_grad():
        want = tg(torch.from_numpy(x), torch.from_numpy(z),
                  torch.from_numpy(c), noise_mode="const").numpy()

    fwd = jax.jit(lambda p, x, z: g(p, x, z, noise_mode="const"))
    got = np.asarray(fwd(params, jnp.asarray(x), jnp.asarray(z)))

    assert got.shape == want.shape == (N, 3, 512, 512)
    err = np.abs(got - want).max()
    assert err < 1e-3, f"max abs err {err} (north star: <=1e-3)"
