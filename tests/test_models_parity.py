"""End-to-end numerical parity: build the reference torch models on CPU,
convert their state_dicts into shgan_tpu param trees, and compare forwards.

Tiny-but-structurally-complete configs (resolution 256 is required by the
comodgan synthesis num_ws table, so channels are shrunk instead)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from shgan_tpu.models import (
    Mapping, Encoder, ShganEncoder, CoModSynthesis, Discriminator,
    CoModGANGenerator, SHU, get_model,
)
from shgan_tpu.checkpoint import torch_state_dict_to_params

ACT = "lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)"


def to_params(module):
    sd = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    return torch_state_dict_to_params(sd)


def test_mapping_parity(ref):
    tm = ref.stylegan.Mapping(z_dim=64, c_dim=0, w_dim=32, num_ws=14,
                              num_layers=8, activation=ACT,
                              lr_multiplier=0.01).eval()
    params = to_params(tm)
    m = Mapping(z_dim=64, c_dim=0, w_dim=32, num_ws=14, num_layers=8,
                activation=ACT, lr_multiplier=0.01)
    rng = np.random.RandomState(0)
    z = rng.randn(3, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(z), None).numpy()
    got = np.asarray(m(params, jnp.asarray(z)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # truncation path (needs a nonzero w_avg)
    wa = rng.randn(32).astype(np.float32)
    with torch.no_grad():
        tm.w_avg.copy_(torch.from_numpy(wa))
        want_t = tm(torch.from_numpy(z), None, truncation_psi=0.7).numpy()
    params["w_avg"] = jnp.asarray(wa)
    got_t = np.asarray(m(params, jnp.asarray(z), truncation_psi=0.7))
    np.testing.assert_allclose(got_t, want_t, rtol=1e-4, atol=1e-5)


def test_shu_parity(ref):
    ts = ref.shgan.SHU(4, 4, dfilter_freedom=[2, 3],
                       dfilter_type="piecewise_linear", input_res=16,
                       lowest_res=4, tail_sigma_mult=3).eval()
    params = to_params(ts)
    s = SHU(4, 4, dfilter_freedom=(2, 3), dfilter_type="piecewise_linear",
            input_res=16, lowest_res=4, tail_sigma_mult=3)
    x = np.random.RandomState(1).randn(2, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = ts(torch.from_numpy(x))
    got = s(params, jnp.asarray(x))
    assert set(got) == set(want)
    for res in want:
        np.testing.assert_allclose(np.asarray(got[res]), want[res].numpy(),
                                   rtol=1e-4, atol=1e-5, err_msg=f"res={res}")


ENC_KW = dict(resolution=64, ic_n=4, oc_n=32, ch_base=512, ch_max=16,
              use_fp16_before_res=None, resample_filter=[1, 3, 3, 1],
              activation=ACT, mbstd_group_size=0, mbstd_c_n=0, c_dim=None,
              cmap_dim=None, use_dropout=True, has_extra_final_layer=False)


def test_encoder_parity(ref):
    te = ref.comodgan.Encoder(**ENC_KW).eval()
    params = to_params(te)
    e = Encoder(**ENC_KW)
    x = np.random.RandomState(2).randn(2, 4, 64, 64).astype(np.float32)
    with torch.no_grad():
        want_x, want_feats = te(torch.from_numpy(x))
    got_x, got_feats = e(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_x), want_x.numpy(),
                               rtol=1e-4, atol=1e-4)
    assert set(got_feats) == set(want_feats)
    for res in want_feats:
        np.testing.assert_allclose(
            np.asarray(got_feats[res]), want_feats[res].numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f"res={res}")


def test_shgan_encoder_parity(ref):
    shu_kw = dict(shu_input_res=16, shu_lowest_res=4, shu_channels=4,
                  shu_df_freedom=[2, 3], shu_df_type="piecewise_linear",
                  shu_tail_sigma_mult=3, shu_gaussian_at_input_res=False)
    te = ref.shgan.Encoder(**{**ENC_KW, **shu_kw}).eval()
    params = to_params(te)
    e = ShganEncoder(**{**ENC_KW, **shu_kw})
    x = np.random.RandomState(3).randn(2, 4, 64, 64).astype(np.float32)
    with torch.no_grad():
        want_x, want_feats = te(torch.from_numpy(x))
    got_x, got_feats = e(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_x), want_x.numpy(),
                               rtol=1e-4, atol=1e-4)
    for res in want_feats:
        np.testing.assert_allclose(
            np.asarray(got_feats[res]), want_feats[res].numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f"res={res}")


SYN_KW = dict(w_dim=32, w0_dim=32, resolution=256, rgb_n=3, ch_base=512,
              ch_max=16, use_fp16_after_res=None,
              resample_filter=[1, 3, 3, 1], activation=ACT)


@pytest.mark.parametrize("noise_mode", ["none", "const"])
def test_comod_synthesis_parity(ref, noise_mode):
    ts = ref.comodgan.Synthesis(**SYN_KW).eval()
    params = to_params(ts)
    s = CoModSynthesis(**SYN_KW)
    rng = np.random.RandomState(4)
    N = 2
    x_global = rng.randn(N, 32).astype(np.float32)
    ws = rng.randn(N, s.num_ws, 32).astype(np.float32)
    feats = {}
    for res in s.block_res:
        ch = min(512 // res, 16)
        feats[res] = rng.randn(N, ch, res, res).astype(np.float32)
    with torch.no_grad():
        want = ts(torch.from_numpy(x_global),
                  {k: torch.from_numpy(v) for k, v in feats.items()},
                  torch.from_numpy(ws), noise_mode=noise_mode).numpy()
    got = np.asarray(s(params, jnp.asarray(x_global),
                       {k: jnp.asarray(v) for k, v in feats.items()},
                       jnp.asarray(ws), noise_mode=noise_mode))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_discriminator_parity(ref):
    kw = dict(resolution=64, ic_n=4, ch_base=512, ch_max=16,
              use_fp16_before_res=None, resample_filter=[1, 3, 3, 1],
              activation=ACT, mbstd_group_size=4, mbstd_c_n=1, c_dim=None,
              cmap_dim=None)
    td = ref.stylegan.Discriminator(**kw).eval()
    params = to_params(td)
    d = Discriminator(**kw)
    x = np.random.RandomState(5).randn(4, 4, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = td(torch.from_numpy(x), None).numpy()
    got = np.asarray(d(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _tiny_generator_cfg():
    """Registry-format config mirroring configs/model/shgan.yaml:17-24 with
    tiny channels."""
    mapping = {"type": "comodgan_mapping",
               "args": dict(z_dim=64, c_dim=0, w_dim=32, num_ws=14,
                            num_layers=2, activation=ACT,
                            lr_multiplier=0.01)}
    encoder = {"type": "shgan_encoder",
               "args": {**{**ENC_KW, "resolution": 256},
                        "shu_input_res": 16, "shu_lowest_res": 4,
                        "shu_channels": 4, "shu_df_freedom": [2, 3],
                        "shu_df_type": "piecewise_linear",
                        "shu_tail_sigma_mult": 3,
                        "shu_gaussian_at_input_res": False}}
    synthesis = {"type": "comodgan_synthesis", "args": SYN_KW}
    return {"type": "comodgan_generator",
            "args": {"mapping": mapping, "encoder": encoder,
                     "synthesis": synthesis}}


def test_full_generator_parity_jit(ref):
    """Full SH-GAN generator: torch reference vs jitted JAX forward."""
    cfg = _tiny_generator_cfg()
    g = get_model(cfg)

    # build the same model in the reference
    tm = ref.stylegan.Mapping(**cfg["args"]["mapping"]["args"]).eval()
    tenc = ref.shgan.Encoder(**cfg["args"]["encoder"]["args"]).eval()
    tsyn = ref.comodgan.Synthesis(**cfg["args"]["synthesis"]["args"]).eval()
    tg = ref.comodgan.Generator(tm, tenc, tsyn).eval()

    params = to_params(tg)
    rng = np.random.RandomState(6)
    N = 2
    real = rng.randn(N, 3, 256, 256).astype(np.float32)
    mask = (rng.rand(N, 1, 256, 256) > 0.4).astype(np.float32)
    x = np.concatenate([mask - 0.5, real * mask], axis=1)
    z = rng.randn(N, 64).astype(np.float32)
    c = np.zeros((N, 0), dtype=np.float32)

    with torch.no_grad():
        want = tg(torch.from_numpy(x), torch.from_numpy(z),
                  torch.from_numpy(c), noise_mode="const").numpy()

    fwd = jax.jit(lambda p, x, z: g(p, x, z, noise_mode="const"))
    got = np.asarray(fwd(params, jnp.asarray(x), jnp.asarray(z)))
    assert got.shape == want.shape == (N, 3, 256, 256)
    err = np.abs(got - want).max()
    assert err < 2e-3, f"max abs err {err}"
