"""CLI entry point — same command shape as the reference:

    python main.py --experiment shgan_ffhq256_eval [--eval 99999] [--debug]
                   [--gpu 0 1 ...] [--seed N] [--pretrained path.pth]

Reference: `/root/reference/main.py:43-89` +
`cfg_helper.py:292-398` (flag surface) — the mp.spawn-per-GPU launcher is
replaced by single-controller JAX over the device mesh; ``--gpu`` is
accepted for compatibility and only bounds the mesh size.
"""

from __future__ import annotations

import argparse
import copy
import os
import os.path as osp
import time


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", type=str, default=None,
                   help="experiment-bank name (not needed with "
                        "--resume_path, which re-reads the run's saved "
                        "config)")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--eval", type=int, default=None,
                   help="run eval only, tagging with this experiment id")
    p.add_argument("--gpu", nargs="+", type=int, default=None,
                   help="device indices (mesh size); default all")
    p.add_argument("--port", type=int, default=None)  # compat, unused
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--signature", nargs="+", type=str, default=None)
    p.add_argument("--pretrained", type=str, default=None,
                   help="override eval.pretrained_pth")
    p.add_argument("--ckpt", type=str, default=None,
                   help="compat alias of --pretrained (the reference "
                        "declares but never consumes this flag, "
                        "cfg_helper.py:313)")
    p.add_argument("--eval_tag", type=str, default=None)
    p.add_argument("--demo", action="store_true",
                   help="write the demo image grid and exit (draw_functor)")
    p.add_argument("--dscache", type=str, default=None)  # compat
    p.add_argument("--resume_path", type=str, default=None)
    p.add_argument("--resume_itern", type=int, default=None)
    p.add_argument("--evalnog_path", type=str, default=None,
                   help="evaluate pre-generated images from this dir "
                        "(no generator in the loop)")
    p.add_argument("--dataset", type=str, default=None,
                   help="swap in a dataset from the dataset bank")
    p.add_argument("--model", type=str, default=None,
                   help="swap in a generator from the model bank")
    p.add_argument("--trainonly", action="store_true",
                   help="drop the eval section")
    p.add_argument("--pick", nargs="+", type=str, default=None,
                   help="restrict eval to these unique_ids")
    return p.parse_args()


def main():
    args = get_args()
    if "cpu" in (os.environ.get("JAX_PLATFORM_NAME", ""),
                 os.environ.get("JAX_PLATFORMS", "")):
        # honor a CPU request at CONFIG level before any backend use: with
        # a TPU plugin installed the env vars only pick the default
        # platform — the plugin still initializes, which blocks forever
        # when its device tunnel is unreachable (CLAUDE.md env gotchas)
        import jax
        jax.config.update("jax_platforms", "cpu")
    # multi-host: join the jax.distributed cluster BEFORE any backend use
    # (env-driven; single-process runs are untouched).  The reference's
    # per-GPU mp.spawn + NCCL init (utils.py:304-309) becomes one JAX
    # process per host over DCN.
    from shgan_tpu.parallel import maybe_initialize_distributed, is_lead
    proc_id, proc_n = maybe_initialize_distributed()
    from shgan_tpu.runtime.config import (experiment_cfg_bank,
                                          apply_debug_shrink)
    from shgan_tpu.runtime.logging import print_log, set_log_file
    from shgan_tpu.runtime.stages import eval_stage, train_stage

    if (args.resume_path is not None and args.eval is None
            and args.experiment is None):
        # --resume_path ALONE reconstructs the run: the solved cfg comes
        # from the run dir's dumped config.yaml, training resumes into
        # the same log dir, and CLI env overrides apply on top
        # (reference cfg_helper.py:422-462).  With --experiment also
        # given, the named experiment wins and resume_path only points at
        # the weights (see below) — e.g. a bare snapshot dir with no
        # config.yaml, or warm-starting a different experiment.
        return _resume_main(args)
    if args.experiment is None:
        raise SystemExit("--experiment is required (or --resume_path to "
                         "continue a saved run)")

    cfg = experiment_cfg_bank()(args.experiment)

    if args.model is not None:
        # swap the generator from the model bank (cfg_helper.py:332-333)
        from shgan_tpu.runtime.config import model_cfg_bank
        cfg["model_g"] = model_cfg_bank()(args.model)
        cfg["model"] = {"symbol": args.model.split("_")[0]}
    if args.dataset is not None:
        # swap datasets from the dataset bank (cfg_helper.py:335-340)
        from shgan_tpu.runtime.config import dataset_cfg_bank
        ds = dataset_cfg_bank()(args.dataset)
        for sec in ("train", "eval"):
            if cfg.get(sec) is not None:
                cfg[sec]["dataset"] = copy.deepcopy(ds)
    if args.trainonly:
        cfg.pop("eval", None)
    if args.pick is not None and cfg.get("eval") is not None:
        cfg["eval"]["dataset"]["pick"] = list(args.pick)

    if args.resume_path is not None and args.eval is None:
        # --experiment + --resume_path: resume these weights into the
        # NAMED experiment config (new log dir; the run-reconstruction
        # path above needs --resume_path alone)
        if cfg.get("train") is None:
            raise SystemExit(f"--resume_path given but experiment "
                             f"[{args.experiment}] has no train section")
        cfg["train"]["resume_path"] = args.resume_path
        if args.resume_itern is not None:
            cfg["train"]["resume_itern"] = args.resume_itern
        print_log(f"resume weights [{args.resume_path}] into experiment "
                  f"[{args.experiment}] (a NEW run; omit --experiment to "
                  "reconstruct the original run from its config.yaml)")

    # --demo promises "write the grid and exit" — it must dispatch to the
    # eval stage even when the experiment carries a train section
    is_eval = (args.eval is not None or args.demo
               or cfg.get("train") is None)
    if is_eval:
        cfg.pop("train", None)
        if cfg.get("eval") is None:
            raise SystemExit(
                f"experiment [{args.experiment}] has no eval section to "
                "run (note --trainonly drops it; this run has no train "
                "section either)" if args.trainonly else
                f"experiment [{args.experiment}] has no eval section — "
                "cannot run eval-mode flags (--eval/--demo) against it")
        if args.eval is not None:
            cfg["eval"]["experiment_id"] = args.eval
    if args.seed is not None:
        cfg["env"]["rnd_seed"] = args.seed
    if args.gpu is not None:
        # reference: --gpu picks the devices (cfg_helper.py:400-420);
        # here it bounds the mesh size
        cfg["env"]["mesh_devices"] = len(args.gpu)
    if args.debug:
        cfg = apply_debug_shrink(cfg)
    if args.ckpt is not None and args.pretrained is None:
        args.pretrained = args.ckpt
    for flag, val in (("--pretrained", args.pretrained),
                      ("--eval_tag", args.eval_tag),
                      ("--evalnog_path", args.evalnog_path)):
        if val is not None and cfg.get("eval") is None:
            raise SystemExit(f"{flag} requires an eval section, but this "
                             "run has none (train-only experiment or "
                             "--trainonly)")
    if args.pretrained is not None:
        cfg["eval"]["pretrained_pth"] = args.pretrained
    if args.eval_tag is not None:
        cfg["eval"]["eval_tag"] = args.eval_tag
    if args.evalnog_path is not None:
        # reference: --evalnog_path sets eval.dataset.gen_dir
        # (cfg_helper.py:394-396); non-loadgen dataset types are wrapped
        ds = cfg["eval"]["dataset"]
        if str(ds.get("type", "")).endswith("loadgen"):
            ds.setdefault("args", {})["gen_dir"] = args.evalnog_path
        else:
            ds["gen_dir"] = args.evalnog_path
            name = ds.get("name")
            loadgen_type = f"{ds['type']}_loadgen"
            from shgan_tpu.data.datasets import _DATASET_REGISTRY
            if loadgen_type in _DATASET_REGISTRY:
                ds["type"] = loadgen_type
                ds.setdefault("args", {})["gen_dir"] = args.evalnog_path
            else:
                cfg["eval"]["dataset"] = {
                    "type": "loadgen", "name": name,
                    "gen_dir": args.evalnog_path,
                    "args": {"base": dict(ds), "gen_dir": args.evalnog_path},
                    "formatter": ds.get("formatter")}
    if args.dscache is not None:
        for sec in ("train", "eval"):
            if cfg.get(sec) and cfg[sec].get("dataset") is not None:
                cfg[sec]["dataset"]["cache"] = True
    # log dir layout: log/<model>_<dataset>/<expid>/<eval_tag|train>
    # (cfg_helper.py:524-564)
    section = "eval" if is_eval else "train"
    expid = cfg[section].get("experiment_id")
    if expid is None:  # 0 is a legitimate id (--eval 0)
        expid = int(time.time() * 100)
        if proc_n > 1:
            # every process must derive the SAME run identity (log_dir
            # feeds caches/snapshots); per-process clocks differ by ms —
            # broadcast the lead's timestamp
            from jax.experimental import multihost_utils
            import numpy as _np
            expid = int(multihost_utils.broadcast_one_to_all(
                _np.int64(expid)))
    if args.signature:
        # reference: signature suffixes the train run dir
        # (cfg_helper.py:524-540)
        expid = f"{expid}_{'_'.join(args.signature)}"
    model_sym = cfg.get("model", {}).get("symbol", "model")
    ds_name = cfg[section]["dataset"].get("name", "dataset")
    tag = cfg[section].get("eval_tag", section) if is_eval else "train"
    log_root = (os.environ.get("SHGAN_LOG_ROOT")
                or cfg["env"].get("log_root_dir", "log"))
    log_dir = osp.join(log_root,
                       f"{model_sym}_{ds_name}", str(expid), tag)
    os.makedirs(log_dir, exist_ok=True)
    cfg[section]["log_dir"] = log_dir
    # writer-process convention: only process 0 tees to the log file and
    # dumps config/code (the reference's RANK==0 gating)
    if is_lead():
        set_log_file(osp.join(log_dir, f"{section}.log"))
    if proc_n > 1:
        print_log(f"process {proc_id}/{proc_n} joined the cluster")

    # dump the solved config for reproducibility (cfg_helper.py:566-571)
    import yaml
    if is_lead():
        with open(osp.join(log_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(_plain(cfg), f, sort_keys=False)

    # code self-snapshot (cfg_helper.py:573-593): copy the framework +
    # configs into the log dir so every run is reproducible byte-for-byte.
    # Skipped in debug; disable with env.code_snapshot: false.
    if not args.debug and is_lead() \
            and cfg.get("env", {}).get("code_snapshot", True):
        import shutil
        snap = osp.join(log_dir, "code")
        if not osp.exists(snap):
            src_root = osp.dirname(osp.abspath(__file__))
            for item in ("shgan_tpu", "configs", "main.py", "bench.py"):
                src = osp.join(src_root, item)
                dst = osp.join(snap, item)
                if osp.isdir(src):
                    shutil.copytree(
                        src, dst,
                        ignore=shutil.ignore_patterns("__pycache__"))
                elif osp.isfile(src):
                    os.makedirs(osp.dirname(dst), exist_ok=True)
                    shutil.copy2(src, dst)

    print_log(f"experiment: {args.experiment}  stage: {section}")
    print_log(f"log_dir: {log_dir}")

    if args.demo:
        # demo grid only (reference --demo → draw_functor,
        # shgan_default.py:27-121)
        cfg.setdefault("eval", {})["output_sample_images"] = True
        cfg["eval"]["demo_only"] = True
    stage = eval_stage() if is_eval else train_stage()
    rv = stage(cfg)
    print_log("done.")
    return rv


def _resume_main(args):
    """``--resume_path``-only training resume (cfg_helper.py:422-462):
    re-read the run's solved config.yaml, pick the snapshot, continue in
    the SAME log dir with a resume banner in the same train.log."""
    from shgan_tpu.parallel import is_lead
    from shgan_tpu.runtime.config import load_resume_run, apply_debug_shrink
    from shgan_tpu.runtime.logging import print_log, set_log_file
    from shgan_tpu.runtime.stages import train_stage

    cfg, snap = load_resume_run(args.resume_path, args.resume_itern)
    # CLI env overrides apply on top of the reconstructed cfg (the
    # reference's cfg_resume.env.update(cfg.env))
    if args.seed is not None:
        cfg["env"]["rnd_seed"] = args.seed
    if args.gpu is not None:
        cfg["env"]["mesh_devices"] = len(args.gpu)
    if args.debug:
        cfg = apply_debug_shrink(cfg)
    cfg["train"]["resume_path"] = snap
    if args.resume_itern is not None:
        cfg["train"]["resume_itern"] = args.resume_itern

    log_dir = cfg["train"]["log_dir"]
    os.makedirs(log_dir, exist_ok=True)
    if is_lead():
        set_log_file(osp.join(log_dir, "train.log"))
    print_log("##########")
    print_log("# resume #")
    print_log("##########")
    print_log(f"resuming {log_dir} from {snap}")
    rv = train_stage()(cfg)
    print_log("done.")
    return rv


def _plain(obj):
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj


if __name__ == "__main__":
    main()
