"""Subprocess driver for the multi-process eval integration test.

Usage: python mh_driver.py <pid> <nproc> <port> <out_dir>

Runs the REAL eval_stage on a tiny SH-GAN generator over a synthetic
dataset, with ``nproc`` JAX processes each holding 2 virtual CPU devices.
The pytest in test_multihost.py asserts the 2-process result matches the
1-process result (per-sample data RNG + shared key streams make the runs
arithmetically identical up to the float32 gather transport)."""

import os
import sys

pid, nproc, port, out_dir = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2").strip()
if nproc > 1:
    os.environ["SHGAN_DIST_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["SHGAN_DIST_NPROCS"] = str(nproc)
    os.environ["SHGAN_DIST_PID"] = str(pid)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from shgan_tpu.parallel import maybe_initialize_distributed  # noqa: E402

maybe_initialize_distributed()

from shgan_tpu.runtime.stages import eval_stage  # noqa: E402

ACT = "lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)"
RES = 64

ENC = {"type": "shgan_encoder", "args": dict(
    resolution=RES, ic_n=4, oc_n=32, ch_base=256, ch_max=8,
    use_fp16_before_res=None, activation=ACT, mbstd_group_size=0,
    mbstd_c_n=0, c_dim=None, cmap_dim=None, use_dropout=True,
    has_extra_final_layer=False, shu_input_res=16, shu_lowest_res=4,
    shu_channels=4, shu_df_freedom=[2, 3],
    shu_df_type="piecewise_linear", shu_tail_sigma_mult=3,
    shu_gaussian_at_input_res=False)}

CFG = {
    "env": {"rnd_seed": 7},
    "model": {"symbol": "shgan"},
    "model_g": {"type": "comodgan_generator", "args": {
        "mapping": {"type": "comodgan_mapping",
                    "args": dict(z_dim=32, c_dim=0, w_dim=32, num_ws=10,
                                 num_layers=2, activation=ACT,
                                 lr_multiplier=0.01)},
        "encoder": ENC,
        "synthesis": {"type": "comodgan_synthesis",
                      "args": dict(w_dim=32, w0_dim=32, resolution=RES,
                                   rgb_n=3, ch_base=256, ch_max=8,
                                   use_fp16_after_res=None,
                                   activation=ACT)}}},
    "eval": {
        "dataset": {
            "type": "synthetic", "name": "synthetic64",
            "args": {"resolution": RES, "length": 8, "seed": 3},
            "formatter": {"type": "RandomMaskFormatter",
                          "args": {"random_flip": False,
                                   "mask_resolution": RES,
                                   "hole_range": [0, 1],
                                   "impl": "numpy"}},
        },
        "evaluator": [{"type": "psnr",
                       "args": {"for_dataset": None, "rgb_range": 1}},
                      {"type": "ssim", "args": {"window_size": 11}}],
        "batch_size": 4,
        "log_dir": out_dir,
        "log_display": 100,
        "pallas_noise": False,
        "noise_mode": "const",
    },
}

rv = eval_stage()(CFG)
print("MH_DRIVER_OK", pid, rv["eval_rv"], flush=True)

if nproc > 1:
    import numpy as np

    # lossless allgather: float64 values beyond float32 precision and bools
    # must survive the byte transport bit-exactly (ADVICE r2: FID feature
    # banks are float64)
    from shgan_tpu.parallel import allgather_rows
    f64 = (np.arange(3, dtype=np.float64) + pid * 3) * (1 + 1e-12)
    got = allgather_rows(f64)
    exp = (np.arange(nproc * 3, dtype=np.float64)) * (1 + 1e-12)
    assert got.dtype == np.float64 and np.array_equal(got, exp), (got, exp)
    b = allgather_rows(np.asarray([pid % 2 == 0, True]))
    assert b.dtype == np.bool_ and b.shape == (2 * nproc,), b
    print("MH_ALLGATHER_OK", pid, flush=True)

    # multi-host snapshot save: every process must enter the orbax save
    # (lead-only gating deadlocks on orbax's cross-process barriers);
    # then a restore round-trips the replicated state
    from shgan_tpu.runtime.stages import train_stage
    from shgan_tpu.parallel import create_mesh, replicated
    from shgan_tpu.checkpoint.orbax_io import load_checkpoint
    import jax.numpy as jnp

    mesh = create_mesh()
    state = {"params_g": {"w": jnp.arange(8.0) * 1.5}, "step": jnp.int32(3)}
    state = jax.device_put(state, replicated(mesh))
    train_stage.save_snapshot(state, out_dir, 1000)
    host = jax.device_get(state)
    got = load_checkpoint(os.path.join(out_dir, "weight",
                                       "network-snapshot-000001"), host)
    np.testing.assert_array_equal(np.asarray(got["params_g"]["w"]),
                                  np.arange(8.0) * 1.5)
    print("MH_SNAPSHOT_OK", pid, flush=True)
