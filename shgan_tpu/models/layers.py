"""Core StyleGAN2 layers as lightweight functional modules.

Each module is a plain Python object holding static configuration; parameters
live in nested dicts whose keys mirror the reference torch ``state_dict``
names exactly (e.g. ``affine.weight`` → ``params['affine']['weight']``), so
the released ``.pth`` checkpoints convert by pure tree renaming.

Reference: `/root/reference/lib/model_zoo/stylegan.py:28-337`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.bias_act import get_activation
from ..ops.dense import dense_init, dense_apply
from ..ops.upfirdn2d import setup_filter
from ..ops.conv_resample import conv2d_resample
from ..ops.modulated_conv import modulated_conv2d


def normalize_2nd_moment(x, axis=1, eps=1e-8):
    """x / sqrt(mean(x², axis)) (reference stylegan.py:343-344)."""
    return x * jax.lax.rsqrt(jnp.square(x).mean(axis=axis, keepdims=True) + eps)


class Dense:
    """Equalized-LR fully-connected layer (reference ``dense``,
    stylegan.py:66-101)."""

    def __init__(self, in_features, out_features, bias=True, bias_init=0.0,
                 activation=None, lr_multi=1.0):
        self.in_features = in_features
        self.out_features = out_features
        self.bias = bias
        self.bias_init = bias_init
        self.lr_multi = lr_multi
        self.activation = get_activation(activation)

    def init(self, key):
        return dense_init(key, self.in_features, self.out_features,
                          bias=self.bias, bias_init=self.bias_init,
                          lr_multi=self.lr_multi)

    def __call__(self, params, x):
        return dense_apply(params, x, lr_multi=self.lr_multi,
                           activation=self.activation)


class Conv2d:
    """Plain conv2d with He init (reference ``conv2d``, stylegan.py:28-64,
    use_wscale=False path — used by SHU's spectral 1×1 conv)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, bias=True, use_wscale=False):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.use_bias = bias
        fan_in = in_channels * kernel_size * kernel_size
        he_std = 1.0 / np.sqrt(fan_in)
        if use_wscale:
            self.init_std, self.weight_gain = 1.0, he_std
        else:
            self.init_std, self.weight_gain = he_std, 1.0

    def init(self, key):
        k = self.kernel_size
        params = {"weight": jax.random.normal(
            key, (self.out_channels, self.in_channels, k, k),
            dtype=jnp.float32) * self.init_std}
        if self.use_bias:
            params["bias"] = jnp.zeros((self.out_channels,), jnp.float32)
        return params

    def __call__(self, params, x):
        w = params["weight"]
        if self.weight_gain != 1.0:
            w = w * self.weight_gain
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        if self.use_bias:
            y = y + params["bias"].astype(y.dtype)[None, :, None, None]
        return y


class Conv2dLayer:
    """Equalized-LR conv with optional FIR up/downsampling
    (reference ``conv2d_layer``, stylegan.py:195-241)."""

    def __init__(self, in_channels, out_channels, kernel_size, bias=True,
                 activation=None, up=1, down=1,
                 resample_filter=(1, 3, 3, 1)):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.use_bias = bias
        self.up = up
        self.down = down
        self.resample_filter = (setup_filter(resample_filter)
                                if resample_filter is not None else None)
        self.padding = kernel_size // 2
        self.weight_gain = 1.0 / np.sqrt(in_channels * kernel_size ** 2)
        self.activation = get_activation(activation)

    def init(self, key):
        k = self.kernel_size
        params = {"weight": jax.random.normal(
            key, (self.out_channels, self.in_channels, k, k), jnp.float32)}
        if self.use_bias:
            params["bias"] = jnp.zeros((self.out_channels,), jnp.float32)
        return params

    def __call__(self, params, x, gain=1.0, folded_in=False,
                 folded_out=False):
        w = params["weight"] * self.weight_gain
        flip_weight = (self.up == 1)
        if folded_in or folded_out:
            # space-to-depth folded domain (ops/folded.py) — exact, for
            # the MXU-starved C≤64 high-res levels
            from ..ops import folded as _fold
            from ..ops.conv_resample import _maybe_flip
            k = self.kernel_size
            if self.padding != (k - 1) // 2:
                # the folded ops hardcode SAME semantics (pad=(k-1)//2);
                # any other padding must fail loudly, not mis-lower
                raise NotImplementedError(
                    f"folded conv requires padding=(k-1)//2, got "
                    f"{self.padding} for k={k}")
            wd = _maybe_flip(w.astype(x.dtype), flip_weight)
            if self.up == 1 and self.down == 1 and k == 3:
                assert folded_in and folded_out
                x = _fold.conv_s1_folded(x, wd)
            elif self.up == 1 and self.down == 1 and k == 1:
                assert folded_in and folded_out
                x = _fold.conv_1x1_folded(x, wd)
            elif self.down == 2 and self.up == 1 and k == 3:
                assert folded_in and not folded_out
                x = _fold.conv_down_folded(x, wd, self.resample_filter)
            elif self.up == 2 and self.down == 1 and k == 3:
                assert folded_out and not folded_in
                x = _fold.conv_up_folded(x, wd, self.resample_filter)
            else:
                raise NotImplementedError((self.up, self.down, k))
        else:
            x = conv2d_resample(x, w.astype(x.dtype), f=self.resample_filter,
                                up=self.up, down=self.down,
                                padding=self.padding,
                                flip_weight=flip_weight)
        if self.use_bias:
            b = params["bias"]
            if folded_out:
                from ..ops.folded import tile_channel_vec
                b = tile_channel_vec(b)
            x = x + b.astype(x.dtype)[None, :, None, None]
        if self.activation is not None:
            x = self.activation(x, gain=gain)
        elif gain != 1.0:
            x = x * gain
        return x


class SynthesisLayer:
    """Modulated conv + per-layer noise injection
    (reference ``synthesis_layer``, stylegan.py:243-304)."""

    def __init__(self, in_channels, out_channels, kernel_size, w_dim,
                 resolution, bias=True,
                 activation="lrelu_agc(alpha=0.2, gain=sqrt_2)", up=1,
                 resample_filter=(1, 3, 3, 1), use_noise=True):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.w_dim = w_dim
        self.resolution = resolution
        self.use_bias = bias
        self.up = up
        self.use_noise = use_noise
        self.resample_filter = (setup_filter(resample_filter)
                                if resample_filter is not None else None)
        self.padding = kernel_size // 2
        self.activation = get_activation(activation)
        self.affine = Dense(w_dim, in_channels, bias=True, bias_init=1.0)

    def init(self, key):
        k0, k1, k2 = jax.random.split(key, 3)
        k = self.kernel_size
        params = {
            "weight": jax.random.normal(
                k0, (self.out_channels, self.in_channels, k, k), jnp.float32),
            "bias": jnp.zeros((self.out_channels,), jnp.float32),
            "affine": self.affine.init(k1),
        }
        if self.use_noise:
            params["noise_const"] = jax.random.normal(
                k2, (self.resolution, self.resolution), jnp.float32)
            params["noise_strength"] = jnp.zeros((), jnp.float32)
        return params

    def __call__(self, params, x, w, gain=1.0, noise_mode="random", rng=None,
                 folded_in=False, folded_out=False):
        assert noise_mode in ("random", "const", "none")
        styles = self.affine(params["affine"], w)
        noise = None
        if self.use_noise and noise_mode == "random":
            assert rng is not None, "noise_mode='random' requires an rng"
            from ..ops.noise import random_noise
            noise = random_noise(
                rng, x.shape[0], self.resolution,
                dtype=jnp.float32) * params["noise_strength"]
        elif self.use_noise and noise_mode == "const":
            noise = params["noise_const"] * params["noise_strength"]
        if noise is not None and folded_out:
            # [N,1,S,S] / [S,S] fine noise → [N,4,S/2,S/2] / [4,S/2,S/2]
            from ..ops.folded import fold_noise
            noise = fold_noise(noise[:, 0] if noise.ndim == 4 else noise)

        flip_weight = (self.up == 1)
        x = modulated_conv2d(
            x, params["weight"], styles, noise=noise, up=self.up,
            padding=self.padding, resample_filter=self.resample_filter,
            flip_weight=flip_weight, folded_in=folded_in,
            folded_out=folded_out)
        if self.use_bias:
            b = params["bias"]
            if folded_out:
                from ..ops.folded import tile_channel_vec
                b = tile_channel_vec(b)
            x = x + b.astype(x.dtype)[None, :, None, None]
        if self.activation is not None:
            x = self.activation(x, gain=gain)
        elif gain != 1.0:
            x = x * gain
        return x


class ToRGBLayer:
    """Modulated 1×1 conv to RGB, no demodulation
    (reference ``torgb_layer``, stylegan.py:306-337): styles are additionally
    scaled by the equalized-LR weight gain."""

    def __init__(self, in_channels, out_channels, kernel_size, w_dim,
                 activation=None):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.w_dim = w_dim
        self.weight_gain = 1.0 / np.sqrt(in_channels * kernel_size ** 2)
        self.activation = get_activation(activation)
        self.affine = Dense(w_dim, in_channels, bias=True, bias_init=1.0)

    def init(self, key):
        k0, k1 = jax.random.split(key)
        k = self.kernel_size
        return {
            "weight": jax.random.normal(
                k0, (self.out_channels, self.in_channels, k, k), jnp.float32),
            "bias": jnp.zeros((self.out_channels,), jnp.float32),
            "affine": self.affine.init(k1),
        }

    def __call__(self, params, x, w, folded=False):
        styles = self.affine(params["affine"], w) * self.weight_gain
        x = modulated_conv2d(x, params["weight"], styles, demodulate=False,
                             folded_in=folded, folded_out=folded)
        b = params["bias"]
        if folded:
            from ..ops.folded import tile_channel_vec
            b = tile_channel_vec(b)
        x = x + b.astype(x.dtype)[None, :, None, None]
        if self.activation is not None:
            x = self.activation(x)
        return x
