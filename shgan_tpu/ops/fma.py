"""Fused multiply-add.

The reference ships a custom-autograd fma (`/root/reference/lib/model_zoo/
stylegan_utils/fma.py:15-58`) because torch wouldn't fuse a*b+c and its
backward needed a hand-written ``_unbroadcast``.  XLA fuses the expression
and differentiates broadcasts natively, so the op is the expression —
kept as an API-parity shim.
"""

from __future__ import annotations


def fma(a, b, c):
    """a * b + c (XLA fuses this into one VPU op; grads come from AD)."""
    return a * b + c
