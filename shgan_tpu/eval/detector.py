"""Shared Inception detector for the feature-space metric family.

The reference computes detector features independently per metric
(`/root/reference/lib/evaluator/stylegan_metrics/metric_utils.py` caches by
URL per process, but each of fid/kid/pr re-runs the forward pass over the
generator output).  Here one :class:`InceptionDetector` is shared by every
feature-space evaluator in a compose — the 2048-d features (and 1008-way
probs) of a given batch array are computed ONCE and memoized by array
identity, so ``evaluator: [fid, kid, pr, is]`` costs a single Inception
pass per batch instead of four.

Weights resolution matches the reference detector contract
(`eva_fid.py:21`): pytorch-fid ``pt_inception-2015-12-05`` ``.pth`` via the
``detector_weights`` arg or the ``SHGAN_TPU_INCEPTION`` env var;
``detector_params`` injects an in-memory tree (tests).
"""

from __future__ import annotations

import functools
import os
import os.path as osp
import sys

import numpy as np
import jax

from .inception import (inception_features, inception_features_and_probs,
                        inception_probs_from_features, load_inception_params)

_MEMO_SLOTS = 4  # fake + real per batch, with headroom for pregen paths


def _tree_platform(tree):
    """Platform ('tpu'/'cpu'/…) of the first jax array leaf, else None."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array):
            try:
                return next(iter(leaf.devices())).platform
            except Exception:
                return None
    return None


def _guard_placement(params):
    """Heal params committed to a non-default backend.

    Regression guard: round-3 shipped detector params COMMITTED to the
    host cpu backend (built under ``jax.default_device(cpu)``), which
    silently moved every jitted Inception forward off the accelerator —
    a ~70× slowdown of the production eval path (BENCH_r03
    ``e2e_img_s`` 293→4.3).  Cross-platform params can never be what the
    caller wants: re-place them on the default backend (as uncommitted
    arrays, so multi-device jits keep their freedom) and say so loudly."""
    plat = _tree_platform(params)
    default = jax.default_backend()
    if plat is None or plat == default:
        return params
    print(f"# InceptionDetector: params were on [{plat}] but the default "
          f"backend is [{default}] — re-placing (build them on the "
          "default backend to avoid this transfer)", file=sys.stderr)
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda v: jnp.asarray(np.asarray(v)) if isinstance(v, jax.Array)
        else v, params)


class InceptionDetector:
    """Jitted Inception forward with identity-memoized per-batch results.

    Memo entries hold the input array by WEAK reference: a dead referent
    cannot match ``is`` against any live array, so ``id`` reuse cannot
    alias — and large device arrays (the eval stage's ``fake_dev``/
    ``real_dev`` views) are not pinned in HBM between batches.  Arrays
    that don't support weakrefs are held strongly (small test inputs)."""

    def __init__(self, params, resize_policy=None):
        params = _guard_placement(params)
        self.params = params
        self.has_probs = "fc" in params
        # 'ts' (default): the reference TorchScript detector's internal
        # TF-style resize — absolute-FID comparable; 'bilinear' emulates
        # pytorch-fid (see inception._resize_299)
        self.resize_policy = resolve_resize_policy(resize_policy)
        self._feat = jax.jit(functools.partial(
            inception_features, resize_policy=self.resize_policy))
        self._feat_probs = jax.jit(functools.partial(
            inception_features_and_probs, resize_policy=self.resize_policy))
        self._head = jax.jit(inception_probs_from_features)
        self._memo = []  # [(ref_or_array, is_weak, feat, probs_or_None)]

    def _find(self, x):
        for i, (ref, is_weak, _, _) in enumerate(self._memo):
            arr = ref() if is_weak else ref
            if arr is x:
                return i
        return None

    def _run(self, x, want_probs):
        import weakref
        if want_probs:
            feat, probs = self._feat_probs(self.params, x)
        else:
            feat, probs = self._feat(self.params, x), None
        # feat/probs stay DEVICE arrays: no per-batch host sync — the
        # dispatch queue runs ahead and evaluators convert (float64) at
        # compute time.  A [N,2048] f32 bank entry is ~1 MB of HBM.
        try:
            entry = (weakref.ref(x), True, feat, probs)
        except TypeError:
            entry = (x, False, feat, probs)
        self._memo.append(entry)
        del self._memo[:-_MEMO_SLOTS]
        return feat, probs

    def features(self, x):
        """x: uint8-valued [N, 3, H, W] → [N, 2048] features (device f32;
        convert with ``np.asarray(feat, np.float64)`` at accumulation/
        compute time — keeping the result on device avoids a host sync
        per batch).

        Never touches the classifier head — a plain FID/KID/PR run costs
        only the trunk for both streams.  If an IS metric later asks for
        probs of the same batch, :meth:`features_and_probs` upgrades the
        memo entry with the head alone (one [N,2048]×[2048,1008] matmul),
        so a compose like [fid, kid, pr, is] still pays ONE trunk pass."""
        i = self._find(x)
        if i is not None:
            return self._memo[i][2]
        return self._run(x, want_probs=False)[0]

    def features_and_probs(self, x):
        """→ ([N, 2048] features, [N, 1008] softmax probs), device f32."""
        if not self.has_probs:
            raise ValueError(
                "detector weights carry no classifier head ('fc') — IS "
                "needs the 1008-way pt_inception head; provide the full "
                "pytorch-fid pt_inception .pth (docs/ASSETS.md)")
        i = self._find(x)
        if i is not None:
            ref, is_weak, feat, probs = self._memo[i]
            if probs is None:
                # head-only upgrade from the memoized trunk features
                probs = self._head(self.params, feat)
                self._memo[i] = (ref, is_weak, feat, probs)
            return feat, probs
        return self._run(x, True)


_BY_PATH = {}
# injected param trees key by id(): compose members (fid+kid+pr+is) pass
# the SAME tree and must share one detector (that sharing is what makes a
# compose cost a single Inception pass per batch).  Bounded: successive
# distinct trees (long test sessions, notebooks) must not each pin a
# ~100 MB param tree + jit caches for the life of the process.
_BY_ID = {}
_BY_ID_MAX = 2


def resolve_resize_policy(resize_policy=None):
    """None → ``SHGAN_TPU_FID_RESIZE`` env override, else 'ts' (the
    reference detector's own behavior)."""
    return (resize_policy or os.environ.get("SHGAN_TPU_FID_RESIZE")
            or "ts")


def get_detector(detector_weights=None, detector_params=None,
                 resize_policy=None):
    """Resolve (and cache) the shared detector.

    Priority: explicit ``detector_params`` (shared per injected tree,
    small LRU — compose members reuse one instance), then
    ``detector_weights`` path, then ``SHGAN_TPU_INCEPTION``.
    """
    resize_policy = resolve_resize_policy(resize_policy)
    if detector_params is not None:
        key = (id(detector_params), resize_policy)
        if key not in _BY_ID:
            _BY_ID[key] = InceptionDetector(detector_params, resize_policy)
            while len(_BY_ID) > _BY_ID_MAX:
                # evict oldest; the cached detector holds its params, so
                # live ids can't be recycled onto stale entries
                _BY_ID.pop(next(iter(_BY_ID)))
        return _BY_ID[key]
    path = detector_weights or os.environ.get("SHGAN_TPU_INCEPTION")
    if not (path and osp.isfile(path)):
        raise FileNotFoundError(
            "Inception detector weights required: pass detector_weights=, "
            "detector_params=, or set SHGAN_TPU_INCEPTION to a pytorch-fid "
            "pt_inception .pth")
    key = (osp.abspath(path), resize_policy)
    if key not in _BY_PATH:
        _BY_PATH[key] = InceptionDetector(load_inception_params(key[0]),
                                          resize_policy)
    return _BY_PATH[key]
