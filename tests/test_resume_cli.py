"""--resume_path-only resume: kill a training run mid-flight, then
``python main.py --resume_path <run_dir>`` reconstructs the cfg from the
dumped config.yaml and continues in the SAME log dir to completion
(reference cfg_helper.py:422-462)."""

import glob
import os
import os.path as osp
import signal
import subprocess
import sys
import time

import pytest
import yaml

pytestmark = pytest.mark.slow

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _env(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (flags +
                        " --xla_force_host_platform_device_count=2").strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["SHGAN_LOG_ROOT"] = str(tmp_path)
    return env


def _snapshots(root):
    return [p for p in glob.glob(osp.join(
        root, "shgan_synthetic32", "*", "train", "weight",
        "network-snapshot-*")) if not p.endswith(".tmp")
        and "tmp" not in osp.basename(p)]


def test_kill_and_resume_with_resume_path_only(tmp_path):
    env = _env(tmp_path)
    main_py = osp.join(REPO, "main.py")

    # launch the run, kill it once the first snapshot has landed
    p = subprocess.Popen([sys.executable, main_py,
                          "--experiment", "smoke_train"],
                         env=env, cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    deadline = time.time() + 600
    try:
        while time.time() < deadline:
            if _snapshots(str(tmp_path)):
                break
            if p.poll() is not None:
                out = p.stdout.read()
                raise AssertionError(
                    f"train exited before first snapshot:\n{out[-3000:]}")
            time.sleep(0.5)
        else:
            raise AssertionError("no snapshot appeared within 600s")
        # orbax writes atomically (tmp dir + rename): give the in-flight
        # rename a beat, then kill hard — the run dies mid-training
        time.sleep(1.0)
    finally:
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)
        p.wait()
        p.stdout.read()

    run_dirs = glob.glob(osp.join(str(tmp_path), "shgan_synthetic32", "*",
                                  "train"))
    assert len(run_dirs) == 1
    run_dir = run_dirs[0]
    assert osp.isfile(osp.join(run_dir, "config.yaml"))

    # resume with ONLY --resume_path (no --experiment)
    p2 = subprocess.run([sys.executable, main_py,
                         "--resume_path", run_dir],
                        env=env, cwd=REPO, capture_output=True, text=True,
                        timeout=900)
    assert p2.returncode == 0, (p2.stdout[-2000:], p2.stderr[-3000:])

    # same run dir, no second expid minted
    assert len(glob.glob(osp.join(str(tmp_path), "shgan_synthetic32",
                                  "*"))) == 1
    # the same train.log carries the resume banner after the original lines
    log = open(osp.join(run_dir, "train.log")).read()
    assert "# resume #" in log
    assert log.index("experiment: smoke_train") < log.index("# resume #")
    # the run completed: final snapshot at total_kimg (0.08 → 80 images)
    with open(osp.join(run_dir, "config.yaml")) as f:
        saved = yaml.safe_load(f)
    assert saved["train"]["total_kimg"] == 0.08
    assert any("network-snapshot-000000" in s
               for s in _snapshots(str(tmp_path)))
    # "done." only prints when train_stage ran to completion
    assert "done." in p2.stdout + log


def test_warm_start_experiment_plus_resume_path(tmp_path):
    """--experiment + --resume_path warm-starts the NAMED experiment from
    the given weights in a NEW run dir (main.py; the reconstruction path
    needs --resume_path alone).  The snapshot is seeded in-process — the
    CLI wiring is what's under test."""
    import jax

    from shgan_tpu.checkpoint.orbax_io import save_checkpoint
    from shgan_tpu.models import get_model
    from shgan_tpu.runtime.config import experiment_cfg_bank
    from shgan_tpu.train import TrainConfig, init_train_state

    cfg = experiment_cfg_bank()("smoke_train")
    G, D = get_model(cfg["model_g"]), get_model(cfg["model_d"])
    state = init_train_state(G, D, jax.random.key(7), TrainConfig())
    snap = str(tmp_path / "seed" / "network-snapshot-000000")
    save_checkpoint(snap, state)

    env = _env(tmp_path)
    p = subprocess.run([sys.executable, osp.join(REPO, "main.py"),
                        "--experiment", "smoke_train",
                        "--resume_path", snap],
                       env=env, cwd=REPO, capture_output=True, text=True,
                       timeout=900)
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-3000:])
    assert "resume weights" in p.stdout          # the warm-start banner
    run_dirs = glob.glob(osp.join(str(tmp_path), "shgan_synthetic32", "*",
                                  "train"))
    assert len(run_dirs) == 1                    # a NEW run dir was minted
    log = open(osp.join(run_dirs[0], "train.log")).read()
    assert "resumed from" in log                 # weights actually loaded
    assert "done." in p.stdout + log             # ran to total_kimg


def test_resume_path_into_eval_experiment_fails_fast(tmp_path):
    """--resume_path with an eval-only experiment is a config error, not a
    20-minute compile then a crash (main.py)."""
    env = _env(tmp_path)
    p = subprocess.run([sys.executable, osp.join(REPO, "main.py"),
                        "--experiment", "shgan_ffhq256_eval",
                        "--resume_path", str(tmp_path / "nowhere")],
                       env=env, cwd=REPO, capture_output=True, text=True,
                       timeout=300)
    assert p.returncode != 0
    assert "no train section" in p.stdout + p.stderr


def test_load_resume_run_snapshot_selection(tmp_path):
    """Unit: run-dir discovery from dir/weight/snapshot paths + itern
    selection (cfg_helper.py:320-328 --resume_itern)."""
    from shgan_tpu.runtime.config import load_resume_run

    run = tmp_path / "run" / "train"
    (run / "weight" / "network-snapshot-000004").mkdir(parents=True)
    (run / "weight" / "network-snapshot-000008").mkdir()
    (run / "weight" / "network-snapshot-best").mkdir()
    with open(run / "config.yaml", "w") as f:
        yaml.safe_dump({"train": {"log_dir": str(run)}}, f)

    cfg, snap = load_resume_run(str(run))
    assert osp.basename(snap) == "network-snapshot-000008"  # latest numeric
    assert cfg["train"]["log_dir"] == str(run)

    _, snap = load_resume_run(str(run), resume_itern=4)
    assert osp.basename(snap) == "network-snapshot-000004"

    _, snap = load_resume_run(
        str(run / "weight" / "network-snapshot-000004"))
    assert osp.basename(snap) == "network-snapshot-000004"

    _, snap = load_resume_run(str(run / "weight"))
    assert osp.basename(snap) == "network-snapshot-000008"

    with pytest.raises(FileNotFoundError):
        load_resume_run(str(tmp_path / "nowhere"))
