"""Logging: console+file tee and scalar logging.

Reference: ``print_log`` and ``distributed_log_manager``
(`/root/reference/lib/log_service.py:11-25,97-236`).  The distributed
broadcast-sync machinery disappears under single-controller JAX; scalars are
already global after the jitted step, so the logger is a plain accumulator
writing ``stats.jsonl`` (and tensorboard when available) like the reference
train stage (`stylegan_default.py:344-350,553-566`).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import time

_LOG_FILE = None


def set_log_file(path):
    global _LOG_FILE
    if path is None:
        _LOG_FILE = None
        return
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    _LOG_FILE = path


def print_log(*args):
    """Console + logfile tee (log_service.py:11-25)."""
    msg = " ".join(str(a) for a in args)
    print(msg)
    sys.stdout.flush()
    if _LOG_FILE is not None:
        with open(_LOG_FILE, "a") as f:
            f.write(msg + "\n")


class ScalarLogger:
    """Weighted scalar accumulator + stats.jsonl + optional tensorboard."""

    def __init__(self, log_dir=None, tensorboard=False):
        self.log_dir = log_dir
        self.acc = {}
        self.tb = None
        self._jsonl = None
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(osp.join(log_dir, "stats.jsonl"), "at")
            if tensorboard:
                try:
                    from torch.utils import tensorboard as tbmod
                    self.tb = tbmod.SummaryWriter(
                        osp.join(log_dir, "tensorboard"))
                except ImportError:
                    self.tb = None

    def accumulate(self, scalars, weight=1.0):
        for k, v in scalars.items():
            s, w = self.acc.get(k, (0.0, 0.0))
            self.acc[k] = (s + float(v) * weight, w + weight)

    def flush(self, step):
        means = {k: s / max(w, 1e-12) for k, (s, w) in self.acc.items()}
        self.acc = {}
        record = {"step": int(step), "time": time.time(), **means}
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        if self.tb is not None:
            for k, v in means.items():
                self.tb.add_scalar(k, v, global_step=int(step))
            self.tb.flush()
        return means

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self.tb is not None:
            self.tb.close()
