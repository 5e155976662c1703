"""Composable LR schedules + optimizer registry (reference L1).

TPU-native equivalent of the reference's registries at
`/root/reference/lib/model_zoo/common/get_scheduler.py:13-141` and
`get_optimizer.py:14-39`.  The reference builds a *list of per-step LRs*
from a pipeline of schedule segments and pokes them into
``optim.param_groups`` each iteration; here the same pipeline compiles to a
pure ``step -> lr`` function usable both eagerly and as an
``optax.Schedule`` (a jit-traceable function of the step counter), so the
LR lives inside the compiled update instead of being host-poked.

Config shape is identical to the reference's YAML pipelines::

    [{"type": "linear",   "args": {"start_lr": 1e-3, "end_lr": 1e-4,
                                   "step": 1000}},
     {"type": "constant", "args": {"lr": 1e-4, "step": 9000}}]
"""

from __future__ import annotations

import numpy as np

_SCHEDULERS = {}
_OPTIMIZERS = {}


def register_scheduler(name):
    def wrapper(fn):
        _SCHEDULERS[name] = fn
        return fn
    return wrapper


def register_optimizer(name):
    def wrapper(fn):
        _OPTIMIZERS[name] = fn
        return fn
    return wrapper


class Segment:
    """A schedule segment: ``lr_at(idx)`` valid for ``0 <= idx < step``."""

    def __init__(self, step, lr_at):
        self.step = int(step)
        self._lr_at = lr_at

    def __getitem__(self, idx):
        if idx >= self.step:
            raise ValueError(idx)
        return float(self._lr_at(idx))

    def to_list(self):
        return [self[i] for i in range(self.step)]


@register_scheduler("constant")
def constant_scheduler(lr, step):
    return Segment(step, lambda i: lr)


@register_scheduler("poly")
def poly_scheduler(start_lr, end_lr, power, step):
    # reference get_scheduler.py:61-72
    return Segment(
        step,
        lambda i: end_lr + (start_lr - end_lr) * (1 - i / step) ** power)


@register_scheduler("linear")
def linear_scheduler(start_lr, end_lr, step):
    return Segment(
        step, lambda i: end_lr + (start_lr - end_lr) * (1 - i / step))


@register_scheduler("multistage")
def multistage_scheduler(start_lr, milestones, gamma, step):
    # reference get_scheduler.py:88-105: constant until each milestone,
    # then ×gamma.
    bounds = np.asarray([0] + list(milestones), dtype=np.int64)

    def lr_at(i):
        stage = int(np.searchsorted(bounds, i, side="right") - 1)
        return start_lr * (gamma ** stage)

    return Segment(step, lr_at)


class ComposedSchedule:
    """Concatenation of segments (reference ``compose``), indexable like the
    reference and callable like an ``optax.Schedule``.

    Indices past the end clamp to the final LR when *called* (the jitted
    update must stay total); ``__getitem__`` raises, matching the reference.
    """

    def __init__(self, segments):
        assert segments
        self.segments = list(segments)
        self.boundaries = np.cumsum([s.step for s in self.segments])
        self.step = int(self.boundaries[-1])

    def __getitem__(self, idx):
        # pure-Python segment dispatch: routing through the traced
        # __call__ would evaluate EVERY segment eagerly per index (and
        # round through f32); the per-segment closed forms are exact f64
        if idx >= self.step:
            raise ValueError(idx)
        for seg, end in zip(self.segments, self.boundaries):
            if idx < end:
                return seg[idx - (end - seg.step)]
        raise ValueError(idx)  # unreachable

    def to_list(self):
        # reference compose semantics: concatenation of the segment lists
        out = []
        for seg in self.segments:
            out.extend(seg.to_list())
        return out

    def __call__(self, count):
        # jit-traceable piecewise evaluation over the segment table.
        import jax.numpy as jnp
        from jax import lax
        count = jnp.clip(count, 0, self.step - 1)
        lr = jnp.float32(self.segments[0]._lr_at(0))
        start = 0
        for seg, end in zip(self.segments, self.boundaries):
            # Sample each segment's lr at the (traced) local index via its
            # closed form; select the active segment.
            local = jnp.clip(count - start, 0, seg.step - 1)
            if isinstance(seg._lr_at(0), (int, float, np.floating)):
                seg_lr = _traceable_lr(seg, local)
            else:  # pragma: no cover
                seg_lr = jnp.float32(seg._lr_at(0))
            lr = lax.select(count >= start, seg_lr.astype(jnp.float32), lr)
            start = int(end)
        return lr


def _traceable_lr(seg, local):
    """Evaluate a segment's LR at a traced index.

    Closed-form segments (constant/poly/linear) trace directly; table-based
    ones (multistage) are gathered from a baked LR table.
    """
    import jax.numpy as jnp
    try:
        return jnp.asarray(seg._lr_at(local))
    except Exception:
        table = jnp.asarray(seg.to_list(), dtype=jnp.float32)
        return table[local]


def get_scheduler(pipeline_cfg):
    """Build a composed schedule from a list of {"type", "args"} dicts
    (reference get_scheduler.__call__, `get_scheduler.py:20-29`)."""
    segments = []
    for ci in pipeline_cfg:
        t = ci["type"] if isinstance(ci, dict) else ci.type
        args = ci["args"] if isinstance(ci, dict) else ci.args
        segments.append(_SCHEDULERS[t](**args))
    if not segments:
        raise ValueError("empty scheduler pipeline")
    return ComposedSchedule(segments)


@register_optimizer("adam")
def _adam(learning_rate, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    import optax
    tx = optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


@register_optimizer("sgd")
def _sgd(learning_rate, momentum=0.0, weight_decay=0.0, nesterov=False):
    import optax
    tx = optax.sgd(learning_rate, momentum=momentum or None,
                   nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def get_optimizer(cfg, learning_rate):
    """Build an optax optimizer from {"type", "args"} (reference
    get_optimizer.__call__, `get_optimizer.py:23-39`; param-group LR scaling
    is expressed in optax via ``optax.multi_transform`` by the caller).

    ``learning_rate`` may be a float or a schedule callable (e.g. from
    :func:`get_scheduler`).
    """
    t = cfg["type"] if isinstance(cfg, dict) else cfg.type
    args = dict(cfg.get("args", {}) if isinstance(cfg, dict) else cfg.args)
    return _OPTIMIZERS[t](learning_rate, **args)
