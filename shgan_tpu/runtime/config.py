"""Config system: YAML banks with inheritance and cross-bank macros.

Reference: `/root/reference/lib/cfg_helper.py:21-290`.  Same user-facing
semantics:

  * three banks — ``configs/model``, ``configs/dataset``,
    ``configs/experiment`` — addressed by entry name;
  * ``super_cfg`` single inheritance with ``args`` dict-merge (models) /
    top-level merge (datasets), plus ``delete_args`` / ``delete``;
  * string macros resolved recursively:
      - ``SAME(path.to.key)``   intra-file reference
      - ``SEARCH(path)``        depth-first reference
      - ``MODEL(name)``         expand a model-bank entry
      - ``DATASET(name)``       expand a dataset-bank entry
  * experiment configs are solved twice so SEARCH sees expanded values
    (`cfg_helper.py:244-246`).

Configs are plain nested dicts with attribute access (``Config``).
"""

from __future__ import annotations

import copy
import os.path as osp

import yaml


class Config(dict):
    """dict with attribute access (the reference uses easydict)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.wrap(v) for v in obj]
        return obj

    def get(self, k, default=None):
        return super().get(k, default)


def _solve_one(cmd, root, banks):
    if not isinstance(cmd, str):
        return cmd
    if cmd.startswith("SAME"):
        zoom = root
        for pi in (p.strip() for p in cmd[len("SAME"):].strip("()").split(".")):
            try:
                pi = int(pi)
            except ValueError:
                pass
            try:
                zoom = zoom[pi]
            except (KeyError, IndexError, TypeError):
                return cmd
        return _solve_one(zoom, root, banks)
    if cmd.startswith("SEARCH"):
        path = [p.strip() for p in cmd[len("SEARCH"):].strip("()").split(".")]
        zoom = root
        found = True
        for pi in path:
            try:
                pi = int(pi)
            except ValueError:
                pass
            try:
                zoom = zoom[pi]
            except (KeyError, IndexError, TypeError):
                found = False
                break
        if found:
            return _solve_one(zoom, root, banks)
        children = (root.values() if isinstance(root, dict)
                    else root if isinstance(root, list) else ())
        for child in children:
            rv = _solve_one(cmd, child, banks)
            if rv != cmd:
                return rv
        return cmd
    if cmd.startswith("MODEL"):
        return banks["model"](cmd[len("MODEL"):].strip("()"))
    if cmd.startswith("DATASET"):
        return banks["dataset"](cmd[len("DATASET"):].strip("()"))
    return cmd


def cfg_solve(cfg, root, banks=None):
    """Resolve macros in-place through lists/dicts (cfg_helper.py:85-100)."""
    if banks is None:
        banks = {"model": model_cfg_bank(), "dataset": dataset_cfg_bank()}
    it = (enumerate(cfg) if isinstance(cfg, list)
          else cfg.items() if isinstance(cfg, dict) else ())
    for k, v in list(it):
        if isinstance(v, (list, dict)):
            cfg[k] = cfg_solve(v, root, banks)
        else:
            cfg[k] = _solve_one(v, root, banks)
    return cfg


def _find_config_root():
    """configs/ next to the caller's cwd or the repo root."""
    here = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
    for cand in ("configs", osp.join(here, "configs")):
        if osp.isdir(cand):
            # absolutize: _Bank instances are cached for the process
            # lifetime — a later chdir must not silently re-point a bank
            # (or only the not-yet-built banks) at a different root
            return osp.abspath(cand)
    raise FileNotFoundError("no configs/ directory found")


class _Bank:
    subdir = None
    _instances = {}

    def __new__(cls, cfg_root=None):
        key = (cls, cfg_root)
        if key not in cls._instances:
            inst = super().__new__(cls)
            inst._init(cfg_root)
            cls._instances[key] = inst
        return cls._instances[key]

    def _init(self, cfg_root):
        root = cfg_root or _find_config_root()
        self.cfg_dir = osp.join(root, self.subdir)
        self.bank = {}
        self.raw = {}
        self._load_all()

    def _load_all(self):
        import glob
        for path in sorted(glob.glob(osp.join(self.cfg_dir, "*.yaml"))):
            with open(path) as f:
                data = yaml.safe_load(f) or {}
            for k, v in data.items():
                self.raw[k] = v

    def __call__(self, name):
        if name in self.bank:
            return copy.deepcopy(self.bank[name])
        if name not in self.raw:
            raise KeyError(f"no entry {name!r} in {self.cfg_dir}")
        cfg = Config.wrap(copy.deepcopy(self.raw[name]))
        cfg = self._resolve(name, cfg)
        self.bank[name] = cfg
        return copy.deepcopy(cfg)

    def _resolve(self, name, cfg):
        raise NotImplementedError


class model_cfg_bank(_Bank):
    subdir = "model"

    def _resolve(self, name, cfg):
        cfg["name"] = name
        if cfg.get("super_cfg"):
            sup = self(cfg.pop("super_cfg"))
            if "args" in cfg:
                sup.setdefault("args", Config()).update(cfg.pop("args"))
            sup.update(cfg)
            cfg = sup
            for d in cfg.pop("delete_args", []) or []:
                cfg["args"].pop(d, None)
        cfg.pop("super_cfg", None)
        return cfg_solve(cfg, cfg)


class dataset_cfg_bank(_Bank):
    subdir = "dataset"

    def _resolve(self, name, cfg):
        cfg["name"] = name
        if cfg.get("super_cfg"):
            sup = self(cfg.pop("super_cfg"))
            sup.update(cfg)
            cfg = sup
            for d in cfg.pop("delete", []) or []:
                cfg.pop(d, None)
        cfg.pop("super_cfg", None)
        return cfg_solve(cfg, cfg)


class experiment_cfg_bank(_Bank):
    """Experiments are one file per name whose top level IS the config
    (cfg_helper.py:231-248), unlike the entry-keyed model/dataset banks."""

    subdir = "experiment"

    def _load_all(self):
        import glob
        for path in sorted(glob.glob(osp.join(self.cfg_dir, "*.yaml"))):
            name = osp.splitext(osp.basename(path))[0]
            with open(path) as f:
                self.raw[name] = yaml.safe_load(f) or {}

    def _resolve(self, name, cfg):
        cfg["name"] = name
        cfg = cfg_solve(cfg, cfg)
        cfg = cfg_solve(cfg, cfg)  # twice so SEARCH sees expansions
        return cfg


def load_resume_run(resume_path, resume_itern=None):
    """Reconstruct a training run from its dumped ``config.yaml``
    (reference `cfg_helper.py:422-462`): ``--resume_path`` alone rebuilds
    the exact original solved cfg and resumes into the SAME log dir, so a
    resume can never silently diverge from the run it continues.

    ``resume_path`` may be the run's log dir (the one holding
    ``config.yaml``), its ``weight/`` dir, or a concrete snapshot dir
    inside ``weight/``.  The snapshot picked is (in order): the one
    matching ``resume_itern`` (kimg, reference ``--resume_itern``
    semantics), the explicitly-named one, else the latest numeric
    ``network-snapshot-*``.

    Returns ``(cfg, snapshot_path)``.
    """
    import glob

    rp = osp.abspath(resume_path)
    run_dir = None
    for cand in (rp, osp.dirname(rp), osp.dirname(osp.dirname(rp))):
        if osp.isfile(osp.join(cand, "config.yaml")):
            run_dir = cand
            break
    if run_dir is None:
        raise FileNotFoundError(
            f"no config.yaml found at or above {resume_path!r} — "
            "--resume_path must point into a run dir whose launch dumped "
            "the solved config (main.py writes it)")
    with open(osp.join(run_dir, "config.yaml")) as f:
        cfg = Config.wrap(yaml.safe_load(f))
    if cfg.get("train") is None:
        raise ValueError(f"{run_dir}/config.yaml has no train section — "
                         "not a training run")
    # resume into the run dir the user POINTED AT, not the absolute
    # log_dir recorded at launch — a moved/copied run (or a different
    # SHGAN_LOG_ROOT) would otherwise silently recreate and write to the
    # stale original path
    cfg["train"]["log_dir"] = run_dir

    weight_dir = osp.join(run_dir, "weight")
    if resume_itern is not None:
        snap = osp.join(weight_dir,
                        "network-snapshot-{:06d}".format(resume_itern))
        if not osp.exists(snap):
            raise FileNotFoundError(snap)
    elif rp != run_dir and osp.basename(rp).startswith("network-snapshot"):
        snap = rp
    else:
        import re
        # strict name match: a hard-killed run can leave orbax's atomic-
        # write tmp dirs (*.orbax-checkpoint-tmp-*) next to good snapshots
        snaps = sorted(
            p for p in glob.glob(
                osp.join(weight_dir, "network-snapshot-*"))
            if re.fullmatch(r"network-snapshot-\d+", osp.basename(p)))
        if not snaps:
            raise FileNotFoundError(
                f"no network-snapshot-* under {weight_dir}")
        snap = snaps[-1]
    return cfg, snap


def apply_debug_shrink(cfg):
    """--debug shrink: tiny batches, few samples, no workers
    (cfg_helper.py:262-290)."""
    for sec in ("train", "eval"):
        if cfg.get(sec):
            cfg[sec]["batch_size_per_gpu"] = 2
            cfg[sec]["dataset_num_workers_per_gpu"] = 0
            if cfg[sec].get("dataset") is not None:
                cfg[sec]["dataset"]["try_sample"] = 32
            # skip the demo grid in debug (extra jit compiles)
            cfg[sec]["output_sample_images"] = False
    if cfg.get("train"):
        # a debug train run is a smoke test: a handful of steps, one
        # snapshot (the reference's --debug is its de-facto integration
        # test, SURVEY.md §4)
        cfg["train"]["total_kimg"] = 0.08
        cfg["train"]["kimg_per_tick"] = 0.02
        cfg["train"]["snapshot_ticks"] = 2
    if cfg.get("env") is not None:
        cfg["env"]["debug"] = True
    return cfg
