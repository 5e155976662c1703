"""Fused bias + activation + gain + clamp.

The reference has no native bias_act kernel — ``lrelu_agc`` is pure PyTorch
(`/root/reference/lib/model_zoo/common/utils.py:117-146`), applied after each
conv (`stylegan.py:232-238`).  On TPU the whole chain (bias add → leaky-ReLU
→ gain multiply → clamp) is elementwise and XLA fuses it into the producing
convolution's epilogue; we keep it as a plain jnp expression and expose the
same string-configured activation factory as the reference
(`utils.py:40-87`), e.g. ``"lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)"``.
"""

from __future__ import annotations

import math
import re
from functools import partial

import jax.numpy as jnp


def lrelu_agc(x, alpha=0.1, gain=1.0, clamp=None, extra_gain=1.0):
    """Leaky-ReLU with gain and clamp (reference ``lrelu_agc.__call__``,
    `common/utils.py:135-143`): ``clamp`` scales with the runtime gain."""
    x = jnp.where(x >= 0, x, x * alpha)
    act_gain = gain * extra_gain
    if act_gain != 1:
        x = x * act_gain
    if clamp is not None:
        act_clamp = clamp * extra_gain
        x = jnp.clip(x, -act_clamp, act_clamp)
    return x


def _sine(x, freq=30.0, gain=1.0, extra_gain=1.0):
    return jnp.sin(freq * x) * (gain * extra_gain)


def _relu(x, extra_gain=1.0):
    y = jnp.maximum(x, 0)
    return y if extra_gain == 1.0 else y * extra_gain


_SPEC_RE = re.compile(r"^(\w+)\s*(?:\((.*)\))?$")


def _parse_value(v):
    v = v.strip()
    if v == "sqrt_2":
        return math.sqrt(2.0)
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v in ("True", "true"):
        return True
    if v in ("False", "false"):
        return False
    if v in ("None", "null"):
        return None
    return v


def get_activation(spec):
    """Parse an activation spec string into ``fn(x, gain=1) -> x``.

    Mirrors the reference's string-configured unit factory
    (`common/utils.py:63-87`), covering the units the model zoo uses:
    ``lrelu_agc(...)``, ``sine(...)``, ``relu``, ``none``/None.
    The returned callable accepts the per-call ``gain`` used for residual
    sqrt(0.5) scaling (`stylegan.py:235`).
    """
    if spec is None or spec == "none":
        return None
    m = _SPEC_RE.match(spec.strip())
    if m is None:
        raise ValueError(f"bad activation spec: {spec!r}")
    name, argstr = m.group(1), m.group(2)
    kwargs = {}
    if argstr:
        for part in argstr.split(","):
            k, v = part.split("=")
            kwargs[k.strip()] = _parse_value(v)

    if name == "lrelu_agc":
        base = partial(lrelu_agc, **kwargs)
    elif name == "sine":
        base = partial(_sine, **kwargs)
    elif name == "relu":
        base = _relu
    else:
        raise ValueError(f"unknown activation: {name!r}")

    def act(x, gain=1.0):
        return base(x, extra_gain=gain)

    return act
