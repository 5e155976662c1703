"""Equalized-learning-rate dense layer (functional).

Reference: ``dense`` at `/root/reference/lib/model_zoo/stylegan.py:66-101`.
Weights are initialized N(0, 1)/lr_multi and rescaled at runtime by
``lr_multi / sqrt(in_features)`` (equalized LR, StyleGAN convention); bias is
scaled by ``lr_multi``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .bias_act import get_activation


def dense_init(key, in_features, out_features, bias=True, bias_init=0.0,
               lr_multi=1.0, dtype=jnp.float32):
    """Returns a param dict {'weight': [out, in], 'bias': [out]?} matching the
    torch state_dict layout of the reference dense layer."""
    params = {
        "weight": jax.random.normal(key, (out_features, in_features),
                                    dtype=dtype) / lr_multi
    }
    if bias:
        params["bias"] = jnp.full((out_features,), float(bias_init),
                                  dtype=dtype)
    return params


def dense_apply(params, x, lr_multi=1.0, activation=None, act_gain=1.0):
    """y = x @ (w * lr_multi/sqrt(in)).T + b * lr_multi, then activation.

    ``activation`` may be a spec string or a callable from
    :func:`..ops.bias_act.get_activation`.
    """
    w = params["weight"]
    in_features = w.shape[1]
    weight_gain = lr_multi / np.sqrt(in_features)
    y = x @ (w * weight_gain).T.astype(x.dtype)
    b = params.get("bias")
    if b is not None:
        if lr_multi != 1.0:
            b = b * lr_multi
        y = y + b.astype(y.dtype)
    if activation is not None:
        if isinstance(activation, str):
            activation = get_activation(activation)
        if activation is not None:
            y = activation(y, gain=act_gain)
    return y
