"""Evaluator base + registry + compose.

Reference: `/root/reference/lib/evaluator/eva_base.py:21-304`.  The reference
gathers per-rank results with serialized ``dist.broadcast`` rings
(`eva_base.py:96-194`) and re-interleaves them with ``zipzap_arrange``
(`eva_base.py:196-230`) to restore dataset order.  Under single-controller
JAX the evaluator receives *global* batches (already gathered across the
mesh by jit output sharding) plus a validity mask that replaces the
"extend"-padding bookkeeping, so sync/zipzap disappear entirely; multi-host
gathering is a ``process_allgather`` at add_batch time.

Evaluators accumulate per-image scalars/features on the host in float64 and
write ``result.json`` exactly like ``compose.save`` (`eva_base.py:249-304`).
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np

_EVALUATOR_REGISTRY = {}


def register_evaluator(name):
    def wrap(cls):
        _EVALUATOR_REGISTRY[name] = cls
        cls.symbol = name
        return cls
    return wrap


def get_evaluator(cfg):
    """cfg: list of {'type': name, 'args': {...}} → ComposeEvaluator."""
    if isinstance(cfg, (list, tuple)):
        evs = [_EVALUATOR_REGISTRY[c["type"]](**dict(c.get("args") or {}))
               for c in cfg]
        return ComposeEvaluator(evs)
    return _EVALUATOR_REGISTRY[cfg["type"]](**dict(cfg.get("args") or {}))


class BaseEvaluator:
    symbol = "base"
    # metrics that drive the generator themselves (PPL) set this; the eval
    # stage then calls run_generator_metrics(G, params, seed) after the
    # batch stream
    needs_generator = False
    # False on metrics that read ONLY the on-device views (fake_dev/
    # real_dev/pred_dev/gt_dev) — when every composed metric is device-fed,
    # the eval stage skips the full-image device→host readback
    consumes_host_pixels = True
    # True on metrics that read the device views — when NO composed metric
    # does, the eval stage skips building them (with f32 transport the
    # views are four full-image f32 device copies per batch)
    consumes_device_views = False

    def __init__(self):
        self.final = {}
        self.sample_n = None

    def run_generator_metrics(self, G, params, seed=0):
        pass

    def set_sample_n(self, n):
        self.sample_n = n

    @staticmethod
    def _log(msg):
        """Metric lines go through the logfile tee — a bare print would
        leave result lines out of the persisted eval.log (the reference
        uses print_log, eva_base.py:246-247)."""
        from ..runtime.logging import print_log
        print_log(msg)

    def add_batch(self, **kwargs):
        raise NotImplementedError

    def compute(self):
        raise NotImplementedError

    def one_line_summary(self):
        self._log("Evaluator {}: {}".format(self.symbol, self.final))

    def clear_data(self):
        pass

    def sync_across_processes(self):
        """Multi-host: gather accumulated per-image rows across processes.

        Convention: accumulator attributes are named ``data`` or
        ``data_*`` and hold lists of ``[n_i, ...]`` arrays.  Per-process
        shards are contiguous in the global order (data/sampler.py), so
        process-order concatenation restores dataset order — the
        single-controller replacement for the reference's broadcast
        ``sync`` + ``zipzap_arrange`` (eva_base.py:96-230).

        Every process must call this (it runs collectives); emptiness of an
        accumulator is config-determined and therefore uniform across
        processes.
        """
        from ..parallel import allgather_rows
        for name, val in list(self.__dict__.items()):
            if (name == "data" or name.startswith("data_")) \
                    and isinstance(val, list) and val:
                local = np.concatenate([np.asarray(v) for v in val], axis=0)
                setattr(self, name, [allgather_rows(local)])

    def drain(self):
        """Fence all deferred device work in the accumulators.

        With device-resident feature banks (detector deferral) the eval
        loop only measures *dispatch*; honest throughput timing must wait
        for the device to finish.  TPU executes executables in launch
        order, so reading one scalar from the LAST accumulated array
        proves everything before it completed (a tiny device→host read —
        ``block_until_ready`` alone is not a reliable fence on tunneled
        backends)."""
        import jax
        for name, val in self.__dict__.items():
            if (name == "data" or name.startswith("data_")) \
                    and isinstance(val, list) and val:
                # the LAST non-empty device chunk (zero-row chunks exist
                # when a batch was fully padding; numpy>=2 arrays also
                # carry a .device attribute, so type-check explicitly)
                for last in reversed(val):
                    if isinstance(last, jax.Array) and last.size:
                        np.asarray(last[(0,) * last.ndim])
                        break

    @staticmethod
    def _apply_valid(arrays, valid):
        """Drop padded rows (the extend=True padding of the sampler).

        All-valid batches pass through untouched — in particular device
        arrays (deferred feature banks) are NOT pulled to the host, so
        full batches never force a per-batch sync."""
        if valid is None:
            return arrays
        valid = np.asarray(valid, bool)
        if valid.all():
            return arrays
        return [None if a is None else np.asarray(a)[valid] for a in arrays]


@register_evaluator("null")
class NullEvaluator(BaseEvaluator):
    """No-op metric (reference ``null_evaluator``, eva_null.py:10) — used
    when only the generated-image dump or demo grid is wanted."""

    consumes_host_pixels = False

    def add_batch(self, **kwargs):
        pass

    def compute(self):
        self.final = {"null": None}
        return None


class ComposeEvaluator:
    """Multi-metric pipeline with result.json save
    (eva_base.py:259-304)."""

    def __init__(self, evaluators):
        self.evaluators = evaluators
        self.sample_n = None

    def add_batch(self, **kwargs):
        for e in self.evaluators:
            e.add_batch(**kwargs)

    def set_sample_n(self, n):
        self.sample_n = n
        for e in self.evaluators:
            e.set_sample_n(n)

    @property
    def needs_generator(self):
        return any(getattr(e, "needs_generator", False)
                   for e in self.evaluators)

    @property
    def consumes_host_pixels(self):
        return any(getattr(e, "consumes_host_pixels", True)
                   for e in self.evaluators)

    @property
    def consumes_device_views(self):
        return any(getattr(e, "consumes_device_views", False)
                   for e in self.evaluators)

    def run_generator_metrics(self, G, params, seed=0):
        for i, e in enumerate(self.evaluators):
            if getattr(e, "needs_generator", False):
                e.run_generator_metrics(G, params, seed=seed + i)

    def sync_across_processes(self):
        for e in self.evaluators:
            e.sync_across_processes()

    def drain(self):
        for e in self.evaluators:
            e.drain()

    def compute(self):
        return {e.symbol: e.compute() for e in self.evaluators}

    def one_line_summary(self):
        for e in self.evaluators:
            e.one_line_summary()

    def clear_data(self):
        for e in self.evaluators:
            e.clear_data()

    def save(self, log_dir):
        results = {e.symbol: _jsonable(e.final) for e in self.evaluators}
        os.makedirs(log_dir, exist_ok=True)
        path = osp.join(log_dir, "result.json")
        if osp.exists(path):
            with open(path) as f:
                old = json.load(f)
            old.update(results)
            results = old
        with open(path, "w") as f:
            json.dump(results, f, indent=2)
        return path


def _jsonable(d):
    out = {}
    for k, v in d.items():
        if isinstance(v, (np.floating, np.integer)):
            v = v.item()
        out[k] = v
    return out
