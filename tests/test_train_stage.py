"""End-to-end train_stage drive on a tiny model + synthetic data,
including checkpoint/resume (runtime/stages.py train_stage)."""

import json
import os
import os.path as osp

import pytest

pytestmark = pytest.mark.slow


ACT = "lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)"
RES = 32


def _tiny_cfg(log_dir):
    enc = dict(resolution=RES, ic_n=4, oc_n=16, ch_base=128, ch_max=8,
               use_fp16_before_res=None, activation=ACT, mbstd_group_size=0,
               mbstd_c_n=0, c_dim=None, cmap_dim=None, use_dropout=True,
               has_extra_final_layer=False, shu_input_res=8,
               shu_lowest_res=4, shu_channels=4, shu_df_freedom=[2, 3],
               shu_df_type="piecewise_linear", shu_tail_sigma_mult=3,
               shu_gaussian_at_input_res=False)
    model_g = {"type": "comodgan_generator", "args": {
        "mapping": {"type": "comodgan_mapping",
                    "args": dict(z_dim=16, c_dim=0, w_dim=16, num_ws=8,
                                 num_layers=2, activation=ACT,
                                 lr_multiplier=0.01)},
        "encoder": {"type": "shgan_encoder", "args": enc},
        "synthesis": {"type": "comodgan_synthesis",
                      "args": dict(w_dim=16, w0_dim=16, resolution=RES,
                                   rgb_n=3, ch_base=128, ch_max=8,
                                   use_fp16_after_res=None,
                                   activation=ACT)}}}
    model_d = {"type": "comodgan_discriminator",
               "args": dict(resolution=RES, ic_n=4, ch_base=128, ch_max=8,
                            use_fp16_before_res=None, activation=ACT)}
    return {
        # mesh_devices=2: 8-participant CPU collectives deadlock their
        # rendezvous on a 1-core host; 2 participants are robust
        "env": {"rnd_seed": 0, "debug": True, "mesh_devices": 2},
        "model_g": model_g,
        "model_d": model_d,
        "eval": {
            "batch_size": 8,
            "dataset": {"type": "synthetic",
                        "resolution": RES, "length": 8,
                        "formatter": {
                            "type": "RandomMaskFormatter",
                            "args": {"mask_resolution": RES,
                                     "random_flip": False}}},
            "nested_eval_samples": 8,
        },
        "train": {
            "log_dir": log_dir,
            "eval_every_kimg": 0.016,  # nested eval every 2 steps
            "batch_size": 8,           # divisible by the 8-device test mesh
            "total_kimg": 0.048,       # 48 images = 6 steps
            "kimg_per_tick": 0.008,    # tick (host sync) every step: the
            # virtual 8-device CPU mesh deadlocks its collective rendezvous
            # if two async steps compete for the single host thread pool
            "snapshot_ticks": 1,
            "dataset": {"type": "synthetic",
                        "resolution": RES, "length": 16,
                        "formatter": {
                            "type": "RandomMaskFormatter",
                            "args": {"mask_resolution": RES,
                                     "random_flip": False}}},
        },
    }


def test_train_stage_end_to_end_and_resume(tmp_path):
    from shgan_tpu.runtime.stages import train_stage

    log1 = str(tmp_path / "run1")
    cfg = _tiny_cfg(log1)
    rv = train_stage()(cfg)
    assert int(rv["state"]["step"]) == 6

    stats = [json.loads(l) for l in
             open(osp.join(log1, "stats.jsonl")) if l.strip()]
    assert stats and "loss_g" in stats[-1]

    # training observability: per-tick G_ema image grids (the reference's
    # fakes{kimg}.png snapshots, stylegan_default.py:402-534)
    demo = os.listdir(osp.join(log1, "demo"))
    assert "fakes_init.png" in demo, demo
    assert any(f.startswith("fakes0000") and f.endswith(".png")
               and "combined" not in f and f != "fakes_init.png"
               for f in demo), demo
    assert "reals.png" in demo and "masks.png" in demo

    weights = sorted(os.listdir(osp.join(log1, "weight")))
    assert weights, "no snapshot written"
    assert "network-snapshot-best" in weights, weights  # nested eval ran
    snap = osp.join(log1, "weight",
                    [w for w in weights if w != "network-snapshot-best"][-1])

    # resume into a second run dir and train a little further
    log2 = str(tmp_path / "run2")
    cfg2 = _tiny_cfg(log2)
    cfg2["train"]["resume_path"] = snap
    cfg2["train"]["total_kimg"] = 0.08   # a few steps past the resumed 48
    cfg2["train"]["image_snapshot_ticks"] = 0   # grids covered above
    rv2 = train_stage()(cfg2)
    assert int(rv2["state"]["step"]) > 6


def test_train_stage_nested_fid(tmp_path):
    """In-train FID: the nested eval runs the detector-backed metric with
    the cached-real-features protocol, logs an eval_fid series, and tracks
    best by LOWER value (VERDICT r3 missing #1)."""
    import jax
    from shgan_tpu.eval.inception import random_inception_params
    from shgan_tpu.runtime.stages import train_stage

    log = str(tmp_path / "run_fid")
    cfg = _tiny_cfg(log)
    det = random_inception_params(jax.random.key(0))
    cfg["eval"]["evaluator"] = [{"type": "fid",
                                 "args": {"detector_params": det}}]
    cfg["eval"]["nested_eval_metric"] = "fid"
    cfg["train"]["total_kimg"] = 0.032          # 4 steps
    cfg["train"]["eval_every_kimg"] = 0.016     # 2 nested evals
    cfg["train"]["image_snapshot_ticks"] = 0
    rv = train_stage()(cfg)
    assert int(rv["state"]["step"]) == 4

    stats = [json.loads(l) for l in
             open(osp.join(log, "stats.jsonl")) if l.strip()]
    fids = [s["eval_fid"] for s in stats if "eval_fid" in s]
    assert fids and all(f > 0 for f in fids), stats
    # real features were cached once under the run's cache dir
    cache = os.listdir(osp.join(log, ".cache"))
    assert any(f.endswith("_real_feat.npy") for f in cache), cache
    assert "network-snapshot-best" in os.listdir(osp.join(log, "weight"))


def test_nested_eval_fid_falls_back_without_detector(tmp_path, monkeypatch):
    """nested_eval_metric=fid without detector assets degrades to psnr at
    BUILD time (asset-free smoke runs keep training)."""
    monkeypatch.delenv("SHGAN_TPU_INCEPTION", raising=False)
    from shgan_tpu.models import get_model
    from shgan_tpu.parallel import create_mesh
    from shgan_tpu.runtime.stages import train_stage

    cfg = _tiny_cfg(str(tmp_path))
    cfg["eval"]["nested_eval_metric"] = "fid"
    G = get_model(cfg["model_g"])
    mesh = create_mesh(1)
    fn = train_stage._make_nested_eval(cfg, cfg["env"], G, mesh)
    # psnr fallback: runs without weights and reports higher-better
    import jax
    params = G.init(jax.random.key(0))
    name, value, higher_better = fn(params)
    assert name == "psnr" and higher_better
