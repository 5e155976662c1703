"""Checkpoint tests: torch-free .pth reading vs torch.save ground truth,
state_dict↔pytree conversion, end-to-end load into a model, Orbax roundtrip."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from shgan_tpu.checkpoint import (load_torch_pth, torch_state_dict_to_params,
                                  params_to_flat_state_dict)


def test_pth_reader_matches_torch(tmp_path):
    """Write with torch.save (zip format), read back without torch."""
    rng = np.random.RandomState(0)
    sd = {
        "a.weight": torch.from_numpy(rng.randn(4, 3).astype(np.float32)),
        "a.bias": torch.from_numpy(rng.randn(4).astype(np.float32)),
        "b.noise_const": torch.from_numpy(rng.randn(8, 8).astype(np.float32)),
        "scalar": torch.tensor(2.5),
        "long": torch.arange(5),
        "half": torch.from_numpy(rng.randn(3).astype(np.float16)),
    }
    path = tmp_path / "ckpt.pth"
    torch.save(sd, str(path))
    loaded = load_torch_pth(str(path))
    assert set(loaded) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(np.asarray(loaded[k]),
                                      sd[k].numpy(), err_msg=k)


def test_pth_reader_noncontiguous_tensor(tmp_path):
    """Strided/transposed tensors must rebuild correctly."""
    t = torch.arange(12, dtype=torch.float32).reshape(3, 4).t()  # stride!
    torch.save({"w": t}, str(tmp_path / "s.pth"))
    loaded = load_torch_pth(str(tmp_path / "s.pth"))
    np.testing.assert_array_equal(loaded["w"], t.numpy())


def test_rebuild_tensor_rejects_out_of_bounds_headers():
    """size/stride/offset come from the untrusted pickle: a header
    addressing past the storage must be refused, not fed to as_strided
    (which would view arbitrary process memory — torch_reader.py)."""
    from shgan_tpu.checkpoint.torch_reader import _rebuild_tensor_v2

    flat = np.arange(10, dtype=np.float32)
    with pytest.raises(ValueError):
        _rebuild_tensor_v2(flat, 0, (4, 4), (4, 1))      # needs 16 > 10
    with pytest.raises(ValueError):
        _rebuild_tensor_v2(flat, 0, (2,), (2 ** 40,))    # huge stride
    with pytest.raises(ValueError):
        _rebuild_tensor_v2(flat, 0, (2, 2), (-2, 1))     # negative stride
    with pytest.raises(ValueError):
        _rebuild_tensor_v2(flat, 11, (), ())             # offset past end
    # legitimate strided views still rebuild
    ok = _rebuild_tensor_v2(flat, 2, (2, 2), (2, 1))
    np.testing.assert_array_equal(ok, [[2, 3], [4, 5]])
    # zero-size dims are fine regardless of stride
    assert _rebuild_tensor_v2(flat, 0, (0, 4), (100, 1)).size == 0


def test_pth_reader_rejects_arbitrary_globals(tmp_path):
    """The reader must refuse to unpickle non-tensor classes."""
    import pickle
    import zipfile

    class Evil:
        pass

    with pytest.raises(Exception):
        with zipfile.ZipFile(tmp_path / "evil.pth", "w") as zf:
            zf.writestr("archive/data.pkl",
                        pickle.dumps({"x": Evil()}))
        load_torch_pth(str(tmp_path / "evil.pth"))


def test_state_dict_roundtrip():
    sd = {
        "mapping.fc0.weight": np.ones((4, 4), np.float32),
        "mapping.w_avg": np.zeros((4,), np.float32),
        "synthesis.b4.conv.weight": np.ones((2, 2, 3, 3), np.float32),
        "synthesis.b4.conv.resample_filter": (
            np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32) / 64),
    }
    params = torch_state_dict_to_params(sd)
    assert "resample_filter" not in params["synthesis"]["b4"]["conv"]
    assert params["mapping"]["fc0"]["weight"].shape == (4, 4)
    flat = params_to_flat_state_dict(params)
    assert set(flat) == {"mapping.fc0.weight", "mapping.w_avg",
                         "synthesis.b4.conv.weight"}


def test_end_to_end_model_load(ref, tmp_path):
    """Save a reference torch module's state_dict to .pth; load it through
    the torch-free path into our model; outputs must match."""
    from shgan_tpu.models import Mapping
    from shgan_tpu.runtime.stages import build_generator, _merge_params
    ACT = "lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)"
    tm = ref.stylegan.Mapping(z_dim=16, c_dim=0, w_dim=16, num_ws=4,
                              num_layers=2, activation=ACT).eval()
    path = tmp_path / "m.pth"
    torch.save(tm.state_dict(), str(path))

    m = Mapping(z_dim=16, c_dim=0, w_dim=16, num_ws=4, num_layers=2,
                activation=ACT)
    params = m.init(jax.random.key(0))
    loaded = torch_state_dict_to_params(load_torch_pth(str(path)))
    params = _merge_params(params, loaded, strict=True)

    z = np.random.RandomState(1).randn(2, 16).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(z), None).numpy()
    got = np.asarray(m(params, jnp.asarray(z)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_merge_params_strict_errors():
    from shgan_tpu.runtime.stages import _merge_params
    params = {"a": {"w": jnp.zeros((2,))}}
    with pytest.raises(KeyError):
        _merge_params(params, {"a": {}}, strict=True)
    with pytest.raises(KeyError):
        _merge_params(params, {"a": {"w": np.zeros(2), "x": np.zeros(1)}},
                      strict=True)
    merged = _merge_params(params, {"a": {}}, strict=False)
    assert merged["a"]["w"].shape == (2,)


def test_orbax_roundtrip(tmp_path):
    from shgan_tpu.checkpoint.orbax_io import save_checkpoint, load_checkpoint
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.int32(7)}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, like=state)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7


def test_pth_export_roundtrip(tmp_path):
    """save_torch_pth → torch-free reader → identical params; and torch
    itself can load the file (the reference's consumption path)."""
    torch = pytest.importorskip("torch")
    from shgan_tpu.checkpoint import (save_torch_pth, load_torch_pth,
                                      torch_state_dict_to_params,
                                      params_to_flat_state_dict)

    rng = np.random.RandomState(0)
    params = {"mapping": {"fc0": {"weight": rng.randn(8, 4).astype(np.float32),
                                  "bias": rng.randn(8).astype(np.float32)}},
              "w_avg": rng.randn(4).astype(np.float32),
              # 0-d: np.ascontiguousarray would promote this to (1,)
              "noise_strength": np.float32(0.25) * np.ones((), np.float32)}
    p = str(tmp_path / "export.pth")
    save_torch_pth(p, params)

    back = torch_state_dict_to_params(load_torch_pth(p))
    np.testing.assert_array_equal(back["mapping"]["fc0"]["weight"],
                                  params["mapping"]["fc0"]["weight"])
    np.testing.assert_array_equal(back["w_avg"], params["w_avg"])
    assert back["noise_strength"].shape == ()

    sd = torch.load(p, map_location="cpu", weights_only=True)
    assert set(sd) == set(params_to_flat_state_dict(params))
    np.testing.assert_array_equal(sd["mapping.fc0.bias"].numpy(),
                                  params["mapping"]["fc0"]["bias"])
