"""Subprocess driver for the multi-process eval integration test.

Usage: python mh_driver.py <pid> <nproc> <port> <out_dir> [mode]

mode "eval" (default): runs the REAL eval_stage on a tiny SH-GAN generator
over a synthetic dataset, with ``nproc`` JAX processes each holding 2
virtual CPU devices.  The pytest in test_multihost.py asserts the
2-process result matches the 1-process result (per-sample data RNG +
shared key streams make the runs arithmetically identical up to the
float32 gather transport).

mode "train": runs the REAL train_stage across the processes, crossing
snapshot ticks (every process must enter the orbax save — the round-2
HIGH advisor scenario), then RESUMES from the written snapshot and trains
further (exercising load_checkpoint + check_replicated under
process_count > 1)."""

import os
import sys

pid, nproc, port, out_dir = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
mode = sys.argv[5] if len(sys.argv) > 5 else "eval"

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

if mode == "train":
    from shgan_tpu.runtime.stages import train_stage

    TRES = 32
    TENC = dict(resolution=TRES, ic_n=4, oc_n=16, ch_base=128, ch_max=8,
                use_fp16_before_res=None, activation=ACT,
                mbstd_group_size=0, mbstd_c_n=0, c_dim=None, cmap_dim=None,
                use_dropout=True, has_extra_final_layer=False,
                shu_input_res=8, shu_lowest_res=4, shu_channels=4,
                shu_df_freedom=[2, 3], shu_df_type="piecewise_linear",
                shu_tail_sigma_mult=3, shu_gaussian_at_input_res=False)

    def train_cfg(total_kimg, resume_path=None):
        return {
            "env": {"rnd_seed": 0},
            "model_g": {"type": "comodgan_generator", "args": {
                "mapping": {"type": "comodgan_mapping",
                            "args": dict(z_dim=16, c_dim=0, w_dim=16,
                                         num_ws=8, num_layers=2,
                                         activation=ACT,
                                         lr_multiplier=0.01)},
                "encoder": {"type": "shgan_encoder", "args": TENC},
                "synthesis": {"type": "comodgan_synthesis",
                              "args": dict(w_dim=16, w0_dim=16,
                                           resolution=TRES, rgb_n=3,
                                           ch_base=128, ch_max=8,
                                           use_fp16_after_res=None,
                                           activation=ACT)}}},
            "model_d": {"type": "comodgan_discriminator",
                        "args": dict(resolution=TRES, ic_n=4, ch_base=128,
                                     ch_max=8, use_fp16_before_res=None,
                                     activation=ACT)},
            "train": {
                "log_dir": out_dir,
                "batch_size": 8,        # 2 per device on the 2×2 layout
                "total_kimg": total_kimg,
                "kimg_per_tick": 0.008,  # tick every step
                "snapshot_ticks": 1,     # orbax save EVERY tick (the r2
                # HIGH scenario: all processes must reach the barriers)
                "image_snapshot_ticks": 1,  # lead-only demo grids
                "resume_path": resume_path,
                "dataset": {"type": "synthetic",
                            "resolution": TRES, "length": 16,
                            "formatter": {
                                "type": "RandomMaskFormatter",
                                "args": {"mask_resolution": TRES,
                                         "random_flip": False}}},
            },
        }

    rv = train_stage()(train_cfg(total_kimg=0.024))  # 3 steps, 3 ticks
    assert int(rv["state"]["step"]) == 3, rv["state"]["step"]
    snap = os.path.join(out_dir, "weight", "network-snapshot-000000")
    assert os.path.isdir(snap), os.listdir(os.path.join(out_dir, "weight"))
    print("MH_TRAIN_SNAPSHOT_OK", pid, flush=True)

    # resume from the snapshot and cross another tick (load_checkpoint +
    # check_replicated + a further save, all under process_count > 1)
    rv2 = train_stage()(train_cfg(total_kimg=0.04, resume_path=snap))
    assert int(rv2["state"]["step"]) > 3, rv2["state"]["step"]
    if pid == 0:
        demo = os.listdir(os.path.join(out_dir, "demo"))
        assert "fakes_init.png" in demo, demo
    print("MH_TRAIN_RESUME_OK", pid, flush=True)
    sys.exit(0)

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
