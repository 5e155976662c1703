"""StyleGAN2 mapping network.

Reference: ``Mapping`` at `/root/reference/lib/model_zoo/stylegan.py:346-430`.
8 equalized-LR dense layers with lr_mult 0.01, input 2nd-moment
normalization, w-average EMA buffer with truncation trick, broadcast to
``num_ws``.  The w_avg EMA update is returned functionally (JAX has no
in-place buffers) — callers in the train step carry it in the state pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import Dense, normalize_2nd_moment


class Mapping:
    def __init__(self, z_dim=512, c_dim=0, w_dim=512, num_ws=14, num_layers=8,
                 embed_features=None, layer_features=None,
                 activation="lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)",
                 lr_multiplier=0.01, w_avg_beta=0.995):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.num_ws = num_ws
        self.num_layers = num_layers
        self.w_avg_beta = w_avg_beta

        if embed_features is None:
            embed_features = w_dim
        if c_dim == 0:
            embed_features = 0
        if layer_features is None:
            layer_features = w_dim
        features_list = ([z_dim + embed_features]
                         + [layer_features] * (num_layers - 1) + [w_dim])

        self.embed = None
        if c_dim > 0:
            self.embed = Dense(c_dim, embed_features)
        self.fcs = []
        for idx in range(num_layers):
            self.fcs.append(Dense(features_list[idx], features_list[idx + 1],
                                  activation=activation,
                                  lr_multi=lr_multiplier))

    def init(self, key):
        keys = jax.random.split(key, self.num_layers + 1)
        params = {}
        if self.embed is not None:
            params["embed"] = self.embed.init(keys[-1])
        for idx, fc in enumerate(self.fcs):
            params[f"fc{idx}"] = fc.init(keys[idx])
        if self.num_ws is not None and self.w_avg_beta is not None:
            params["w_avg"] = jnp.zeros((self.w_dim,), jnp.float32)
        return params

    def __call__(self, params, z, c=None, truncation_psi=1.0,
                 truncation_cutoff=None, update_w_avg=False):
        """Returns ``ws`` of shape [N, num_ws, w_dim] (or [N, w_dim] when
        num_ws is None).  With ``update_w_avg=True`` returns
        ``(ws, new_w_avg)`` for the training step to thread through state."""
        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            y = normalize_2nd_moment(self.embed(params["embed"],
                                                c.astype(jnp.float32)))
            x = jnp.concatenate([x, y], axis=1) if x is not None else y

        for idx, fc in enumerate(self.fcs):
            x = fc(params[f"fc{idx}"], x)

        new_w_avg = None
        if update_w_avg and self.w_avg_beta is not None:
            # x_mean.lerp(w_avg, beta) (stylegan.py:417)
            x_mean = jax.lax.stop_gradient(x).mean(axis=0)
            new_w_avg = x_mean + self.w_avg_beta * (params["w_avg"] - x_mean)

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None], self.num_ws, axis=1)

        if truncation_psi != 1:
            assert self.w_avg_beta is not None
            w_avg = params["w_avg"]
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg + truncation_psi * (x - w_avg)
            else:
                head = w_avg + truncation_psi * (
                    x[:, :truncation_cutoff] - w_avg)
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)

        if update_w_avg:
            return x, new_w_avg
        return x
