"""SH-GAN encoder: CoModGAN encoder + SHU spectral hints on the skip feats.

Reference: shgan ``Encoder`` at
`/root/reference/lib/model_zoo/shgan.py:338-383`: runs the SHU over the last
``shu_channels`` channels of ``feats[shu_input_res]`` and adds each
per-resolution hint into the last ``shu_channels`` channels of every skip
feature map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .encoder import Encoder
from .shu import SHU


class ShganEncoder(Encoder):
    def __init__(self, *, shu_input_res=64, shu_lowest_res=4, shu_channels=32,
                 shu_df_freedom=(2, 3), shu_df_type="piecewise_linear",
                 shu_tail_sigma_mult=3, shu_gaussian_at_input_res=False,
                 **kwargs):
        super().__init__(**kwargs)
        self.shu_input_res = shu_input_res
        self.shu_channels = shu_channels
        self.shu = SHU(shu_channels, shu_channels,
                       dfilter_freedom=shu_df_freedom,
                       dfilter_type=shu_df_type, input_res=shu_input_res,
                       lowest_res=shu_lowest_res,
                       tail_sigma_mult=shu_tail_sigma_mult,
                       gaussian_at_input_res=shu_gaussian_at_input_res)

    def init(self, key):
        k0, k1 = jax.random.split(key)
        params = super().init(k0)
        params["shu"] = self.shu.init(k1)
        return params

    def __call__(self, params, img, c=None, rng=None, train=False):
        x, feats = super().__call__(params, img, c=c, rng=rng, train=train)
        ch = self.shu_channels
        infeat = feats[self.shu_input_res]
        if (self.fold_above_res is not None
                and self.shu_input_res > self.fold_above_res):
            # the SHU tap level is folded: take the last ch channels of
            # each per-phase block, then restore the fine layout for the
            # (resolution-static) spectral pipeline
            from ..ops.folded import unfold
            n, c4, h, w = infeat.shape
            infeat = unfold(infeat.reshape(n, 4, c4 // 4, h, w)[:, :, -ch:]
                            .reshape(n, 4 * ch, h, w))
        else:
            infeat = infeat[:, -ch:]
        hints = self.shu(params["shu"], infeat)
        for res, hint in hints.items():
            feat = feats[res]
            if (self.fold_above_res is not None
                    and res > self.fold_above_res):
                # feat is phase-major folded (ops/folded.py): the "last
                # ch channels" of the fine layout are the last ch of each
                # per-phase channel block
                from ..ops.folded import fold
                n, c4, h, w = feat.shape
                f4 = feat.reshape(n, 4, c4 // 4, h, w)
                hf = fold(hint).reshape(n, 4, ch, h, w)
                fb = f4[:, :, -ch:] + hf.astype(feat.dtype)
                feats[res] = jnp.concatenate(
                    [f4[:, :, :-ch], fb], axis=2).reshape(n, c4, h, w)
            else:
                fa = feat[:, :-ch]
                fb = feat[:, -ch:] + hint.astype(feat.dtype)
                feats[res] = jnp.concatenate([fa, fb], axis=1)
        return x, feats
