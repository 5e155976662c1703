"""Registered feature-space evaluators: KID, improved precision/recall,
and inception score, wired around the shared Inception detector.

Reference registrations: `/root/reference/lib/evaluator/stylegan_metrics/
metric_main.py:145-166` (kid50k_full, pr50k3_full, is50k).  The reference's
suite is driven by a separate metric runner; here the metrics are ordinary
evaluators so ``evaluator: [{type: fid}, {type: kid}, {type: pr},
{type: is}]`` composes in one eval pass — all four share ONE Inception
forward per batch through :mod:`.detector`, and kid/pr reuse fid's
``<tag>_real_feat.npy`` real-feature cache (`eva_fid.py:177-187`).
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import numpy as np

from .base import BaseEvaluator, register_evaluator
from .detector import get_detector
from .stylegan_metrics import (compute_inception_score, compute_kid,
                               compute_precision_recall)


class FeatureBankEvaluator(BaseEvaluator):
    """Accumulates detector features of fake (and optionally real) batches,
    with the reference's cached-real-features protocol."""

    needs_real = True
    needs_probs = False
    # reads fake_dev/real_dev when present — no host pixels needed
    # (the eval stage then skips the per-batch image readback)
    consumes_host_pixels = False
    consumes_device_views = True

    def __init__(self, device=None, sample_real_n=None, sample_fake_n=None,
                 dsstat_cachefile_tag=None, detector_weights=None,
                 cache_dir=".cache", detector_params=None,
                 resize_policy=None, **_):
        super().__init__()
        del device  # the reference's cuda/cpu switch; JAX places for us
        self.sample_real_n = sample_real_n
        self.sample_fake_n = sample_fake_n
        self.data_fake_feat = []
        self.data_fake_probs = []
        self.data_real_feat = []
        self.dsstat_cache_file = None
        self.dsstat_use_cache = False
        if dsstat_cachefile_tag is not None and self.needs_real:
            # the resolved resize policy is part of the cache identity:
            # features computed under 'bilinear' vs 'ts' differ, and a
            # silent policy flip (r4 changed the default) must miss the
            # cache rather than corrupt FID (ADVICE r4, medium)
            from .detector import resolve_resize_policy
            policy = resolve_resize_policy(resize_policy)
            self.dsstat_cache_file = osp.join(
                cache_dir,
                f"{dsstat_cachefile_tag}_{policy}_real_feat.npy")
            if jax.process_count() > 1:
                # the use-cache decision must be uniform across processes
                # (sync_across_processes pairs collectives by which banks
                # are non-empty) but isfile() is per-host disk state —
                # multi-host runs always recompute real features; only
                # the lead writes the cache for later single-host runs
                self.dsstat_use_cache = False
            else:
                self.dsstat_use_cache = osp.isfile(self.dsstat_cache_file)
        # NOTE: cached real features depend on the detector's resize
        # policy — reuse a <tag>_real_feat.npy only with the policy that
        # wrote it (reference caches were written by the TS detector,
        # i.e. policy 'ts', the default here)
        self.detector = get_detector(detector_weights, detector_params,
                                     resize_policy)

    def add_batch(self, fake, real, valid=None, fake_dev=None, real_dev=None,
                  **_):
        """fake/real: uint8-valued [N, 3, H, W] arrays (0..255).

        ``fake_dev``/``real_dev``: optional on-device copies of the same
        values; when present the detector consumes them directly, so
        generator output feeds Inception device-to-device and only the
        2048-d features ever cross to the host (the numpy args still serve
        the pixel metrics in the same compose)."""
        fx = fake if fake_dev is None else fake_dev
        rx = real if real_dev is None else real_dev
        if self.needs_probs:
            fake_feat, fake_probs = self.detector.features_and_probs(fx)
        else:
            fake_feat, fake_probs = self.detector.features(fx), None
        real_feat = None
        if self.needs_real and not self.dsstat_use_cache:
            real_feat = self.detector.features(rx)
        if jax.process_count() > 1:
            # multi-host dev feeds: the detector consumed GLOBAL sharded
            # pixel arrays (no host round trip for images); each process
            # keeps its own contiguous feature rows — [n_local, 2048] per
            # batch is the only device→host traffic, and the existing
            # allgather in sync_across_processes restores global order
            from ..parallel import local_rows
            fake_feat = local_rows(fake_feat)
            fake_probs = None if fake_probs is None else local_rows(
                fake_probs)
            real_feat = None if real_feat is None else local_rows(real_feat)
        fake_feat, fake_probs, real_feat = self._apply_valid(
            [fake_feat, fake_probs, real_feat], valid)
        self.data_fake_feat.append(fake_feat)
        if fake_probs is not None:
            self.data_fake_probs.append(fake_probs)
        if real_feat is not None:
            self.data_real_feat.append(real_feat)

    def _gather(self):
        """→ (fake_feat, real_feat, fake_probs), truncated to the sample
        counts, with real features loaded from / saved to the cache file."""
        sample_fake_n = (self.sample_n if self.sample_fake_n is None
                         else self.sample_fake_n)
        sample_real_n = (self.sample_n if self.sample_real_n is None
                         else self.sample_real_n)

        def _bank(chunks):
            # chunks may be deferred DEVICE f32 arrays (detector keeps
            # results on device so the dispatch queue runs ahead); the
            # host pull + float64 widening happen here, once, matching
            # the reference's float64 banks (eva_fid.py:207-211) and
            # keeping the real-feature cache byte-compatible.  f32→f64 is
            # exact, so deferral does not change any metric value.
            return np.concatenate(
                [np.asarray(c, np.float64) for c in chunks], 0)

        fake_feat = _bank(self.data_fake_feat)[:sample_fake_n]
        fake_probs = None
        if self.data_fake_probs:
            fake_probs = _bank(self.data_fake_probs)[:sample_fake_n]
        real_feat = None
        if self.needs_real:
            if self.dsstat_use_cache:
                real_feat = np.load(self.dsstat_cache_file)[:sample_real_n]
            else:
                real_feat = _bank(self.data_real_feat)[:sample_real_n]
                if self.dsstat_cache_file is not None:
                    from ..parallel import is_lead
                    # writer-process convention; skip if a sibling in the
                    # same compose (shared tag: fid+kid+pr) already wrote
                    # the identical bank this run
                    if is_lead() and not osp.isfile(self.dsstat_cache_file):
                        os.makedirs(osp.dirname(self.dsstat_cache_file),
                                    exist_ok=True)
                        np.save(self.dsstat_cache_file, real_feat)
        return fake_feat, real_feat, fake_probs

    def clear_data(self):
        self.data_fake_feat = []
        self.data_fake_probs = []
        self.data_real_feat = []


@register_evaluator("kid")
class KIDEvaluator(FeatureBankEvaluator):
    """Kernel Inception Distance ×1000 is NOT applied (raw MMD, matching
    `kernel_inception_distance.py:45`)."""

    def __init__(self, num_subsets=100, max_subset_size=1000, kid_seed=0,
                 **kw):
        super().__init__(**kw)
        self.num_subsets = num_subsets
        self.max_subset_size = max_subset_size
        self.kid_seed = kid_seed

    def compute(self):
        fake_feat, real_feat, _ = self._gather()
        kid = compute_kid(real_feat, fake_feat,
                          num_subsets=self.num_subsets,
                          max_subset_size=self.max_subset_size,
                          seed=self.kid_seed)
        self.final["kid"] = kid
        return kid

    def one_line_summary(self):
        self._log("Evaluator kid: {:.6f}".format(self.final["kid"]))


@register_evaluator("pr")
class PREvaluator(FeatureBankEvaluator):
    """Improved precision & recall (`precision_recall.py:37-60`)."""

    def __init__(self, nhood_size=3, **kw):
        super().__init__(**kw)
        self.nhood_size = nhood_size

    def compute(self):
        fake_feat, real_feat, _ = self._gather()
        precision, recall = compute_precision_recall(
            real_feat, fake_feat, nhood_size=self.nhood_size)
        self.final["precision"] = precision
        self.final["recall"] = recall
        return {"precision": precision, "recall": recall}

    def one_line_summary(self):
        self._log("Evaluator pr: precision {:.4f} recall {:.4f}".format(
            self.final["precision"], self.final["recall"]))


@register_evaluator("is")
class ISEvaluator(FeatureBankEvaluator):
    """Inception score of the generated images (`inception_score.py:27-35`);
    consumes only the fake stream (no real features accumulated)."""

    needs_real = False
    needs_probs = True

    def __init__(self, num_splits=10, **kw):
        super().__init__(**kw)
        self.num_splits = num_splits

    def compute(self):
        fake_feat, _, fake_probs = self._gather()
        del fake_feat
        mean, std = compute_inception_score(fake_probs,
                                            num_splits=self.num_splits)
        self.final["is_mean"] = mean
        self.final["is_std"] = std
        return {"is_mean": mean, "is_std": std}

    def one_line_summary(self):
        self._log("Evaluator is: {:.4f} ± {:.4f}".format(
            self.final["is_mean"], self.final["is_std"]))
