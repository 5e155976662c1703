"""CoModGAN encoder: resolution pyramid down to 4², global code + skip feats.

References:
  * ``encoder_block`` (discriminator block that also returns the
    pre-downsample feature): `/root/reference/lib/model_zoo/comodgan.py:34-64`
  * ``encoder_epilogue`` (flatten → fc → optional out → dropout):
    `/root/reference/lib/model_zoo/comodgan.py:66-113`
  * ``Encoder`` pyramid: `/root/reference/lib/model_zoo/comodgan.py:115-205`

Dropout note: the reference uses ``torch.nn.Dropout(p=0.5)`` which is only
active in train mode (comodgan.py:94-96); we mirror that with a ``train``
flag + rng.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.minibatch_std import minibatch_std
from ..parallel.spatial import constrain as spatial_constrain
from .layers import Dense, Conv2dLayer
from .mapping import Mapping


class EncoderBlock:
    """fromrgb? → conv0 (feat out) → conv1 down=2 (+ optional residual)."""

    def __init__(self, ic_n, mc_n, oc_n, rgb_n=None,
                 resample_filter=(1, 3, 3, 1),
                 activation="lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)",
                 reslink=False, use_fp16=False, folded=False):
        self.reslink = reslink
        # folded: run this level in the space-to-depth domain
        # (ops/folded.py) — exact; wins on the MXU-starved C≤64 levels.
        # Input x/img is folded at entry (a transpose the first block
        # amortizes over a 4-channel image); conv1's folded down-conv
        # emits the next level UNFOLDED for free; feat stays folded for
        # the same-level synthesis skip.
        self.folded = folded
        assert not (folded and reslink), "folded reslink not implemented"
        self.dtype = jnp.bfloat16 if use_fp16 else jnp.float32
        self.fromrgb = None
        if rgb_n is not None:
            self.fromrgb = Conv2dLayer(rgb_n, mc_n, 1, bias=True,
                                       activation=activation,
                                       resample_filter=None)
        self.conv0 = Conv2dLayer(ic_n, mc_n, 3, bias=True,
                                 activation=activation, resample_filter=None)
        self.conv1 = Conv2dLayer(mc_n, oc_n, 3, bias=True,
                                 activation=activation, down=2,
                                 resample_filter=resample_filter)
        self.skip = None
        if reslink:
            self.skip = Conv2dLayer(mc_n, oc_n, 1, bias=False, down=2,
                                    resample_filter=resample_filter)

    def init(self, key):
        keys = jax.random.split(key, 4)
        params = {"conv0": self.conv0.init(keys[0]),
                  "conv1": self.conv1.init(keys[1])}
        if self.fromrgb is not None:
            params["fromrgb"] = self.fromrgb.init(keys[2])
        if self.skip is not None:
            params["skip"] = self.skip.init(keys[3])
        return params

    def __call__(self, params, x, img):
        """Returns (x_downsampled, feat) — feat is the conv0 output used as
        the synthesis skip (comodgan.py:56-64)."""
        if self.folded:
            return self._call_folded(params, x, img)
        if x is not None:
            x = x.astype(self.dtype)
        if self.fromrgb is not None:
            img = img.astype(self.dtype)
            y = self.fromrgb(params["fromrgb"], img)
            x = x + y if x is not None else y

        if self.reslink:
            y = self.skip(params["skip"], x, gain=np.sqrt(0.5))
            feat = self.conv0(params["conv0"], x)
            x = self.conv1(params["conv1"], feat, gain=np.sqrt(0.5))
            x = y + x
        else:
            feat = self.conv0(params["conv0"], x)
            x = self.conv1(params["conv1"], feat)
        # opt-in spatial sharding (parallel/spatial.py): no-op by default
        return spatial_constrain(x), spatial_constrain(feat)

    def _call_folded(self, params, x, img):
        """Folded-domain version of the block: identical math, phase-major
        space-to-depth layout (ops/folded.py).  feat is returned FOLDED."""
        from ..ops.folded import fold
        if x is not None:
            x = x.astype(self.dtype)
            if x.shape[1] == self.conv0.in_channels:
                x = fold(x)  # previous level handed us the unfolded layout
        if self.fromrgb is not None:
            img = img.astype(self.dtype)
            if img.shape[1] == self.fromrgb.in_channels:
                img = fold(img)  # caller may pre-fold (4× channels)
            y = self.fromrgb(params["fromrgb"], img, folded_in=True,
                             folded_out=True)
            x = x + y if x is not None else y
        feat = self.conv0(params["conv0"], x, folded_in=True, folded_out=True)
        x = self.conv1(params["conv1"], feat, folded_in=True)
        # same opt-in spatial-sharding annotation as the direct path —
        # constraining the folded [N,4C,H/2,W/2] layout is semantically a
        # no-op when inactive and keeps GSPMD halos on folded levels too
        return spatial_constrain(x), spatial_constrain(feat)


class EncoderEpilogue:
    """4² epilogue producing the global co-modulation code
    (comodgan.py:66-113)."""

    def __init__(self, ic_n, oc_n, resolution=4, cmap_dim=None, rgb_n=None,
                 mbstd_group_size=4, mbstd_c_n=1,
                 activation="lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)",
                 reslink=False, use_dropout=True,
                 has_extra_final_layer=True):
        self.ic_n = ic_n
        self.cmap_dim = cmap_dim
        self.resolution = resolution
        self.use_dropout = use_dropout
        self.mbstd_group_size = mbstd_group_size
        self.mbstd_c_n = mbstd_c_n
        self.fromrgb = None
        if rgb_n is not None:
            self.fromrgb = Conv2dLayer(rgb_n, ic_n, 1, bias=True,
                                       activation=activation,
                                       resample_filter=None)
        self.conv = Conv2dLayer(ic_n + mbstd_c_n, ic_n, 3, bias=True,
                                activation=activation, resample_filter=None)
        self.fc = Dense(ic_n * resolution ** 2, oc_n, activation=activation)
        self.out = Dense(oc_n, oc_n) if has_extra_final_layer else None

    def init(self, key):
        keys = jax.random.split(key, 4)
        params = {"conv": self.conv.init(keys[0]),
                  "fc": self.fc.init(keys[1])}
        if self.out is not None:
            params["out"] = self.out.init(keys[2])
        if self.fromrgb is not None:
            params["fromrgb"] = self.fromrgb.init(keys[3])
        return params

    def __call__(self, params, x, img=None, cmap=None, rng=None, train=False):
        x = x.astype(jnp.float32)
        if self.fromrgb is not None:
            x = x + self.fromrgb(params["fromrgb"], img.astype(jnp.float32))
        if self.mbstd_c_n > 0:
            x = minibatch_std(x, self.mbstd_group_size, self.mbstd_c_n)
        feat = self.conv(params["conv"], x)
        x = self.fc(params["fc"], feat.reshape(feat.shape[0], -1))
        if self.out is not None:
            x = self.out(params["out"], x)
        if self.use_dropout and train:
            assert rng is not None, "encoder dropout requires rng in training"
            keep = jax.random.bernoulli(rng, 0.5, x.shape)
            x = jnp.where(keep, x / 0.5, 0.0).astype(x.dtype)
        if self.cmap_dim is not None:
            x = (x * cmap).sum(axis=1, keepdims=True) / np.sqrt(self.cmap_dim)
        return x, feat


class Encoder:
    """CoModGAN encoder (comodgan.py:115-205): returns the 1024-d global
    code and the {res: skip-feature} dict."""

    def __init__(self, resolution=256, ic_n=3, oc_n=1024, ch_base=16384,
                 ch_max=512, use_fp16_before_res=16,
                 resample_filter=(1, 3, 3, 1),
                 activation="lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)",
                 mbstd_group_size=4, mbstd_c_n=1, c_dim=None, cmap_dim=None,
                 use_dropout=True, has_extra_final_layer=True, remat=False,
                 fold_above_res=None):
        # remat: rematerialize each block in backward (jax.checkpoint) —
        # trades ~1 extra forward for O(depth) less activation HBM, the
        # TPU-native answer to training-step OOM at large batch
        self.remat = remat
        # fold_above_res: run blocks at resolution > this in the
        # space-to-depth folded domain (ops/folded.py) — exact rewrite,
        # measured 1.5-2.6× on the MXU-starved C≤64 levels; keep it at a
        # resolution where channels are ≤64 (folding 128-ch levels LOSES,
        # tools/bench_folded.py)
        self.fold_above_res = fold_above_res
        log2res = int(np.log2(resolution))
        if 2 ** log2res != resolution:
            raise ValueError(resolution)
        self.resolution = resolution
        self.encode_res = [2 ** i for i in range(log2res, 1, -1)]
        self.ic_n = ic_n
        self.oc_n = oc_n

        self.blocks = {}
        for idx, (resi, resj) in enumerate(zip(self.encode_res[:-1],
                                               self.encode_res[1:])):
            ch_i = min(ch_base // resi, ch_max)
            ch_j = min(ch_base // resj, ch_max)
            use_fp16 = (use_fp16_before_res is not None
                        and resi > use_fp16_before_res)
            self.blocks[resi] = EncoderBlock(
                ch_i, ch_i, ch_j, rgb_n=ic_n if idx == 0 else None,
                resample_filter=resample_filter, activation=activation,
                reslink=False, use_fp16=use_fp16,
                folded=(fold_above_res is not None
                        and resi > fold_above_res))

        self.mapping = None
        if c_dim is not None and c_dim > 0:
            self.mapping = Mapping(z_dim=0, c_dim=c_dim, w_dim=cmap_dim,
                                   num_ws=None, w_avg_beta=None)

        hidden_ch = min(ch_base // self.encode_res[-1], ch_max)
        self.b4 = EncoderEpilogue(
            hidden_ch, oc_n, resolution=4, cmap_dim=None,
            activation=activation, mbstd_group_size=mbstd_group_size,
            mbstd_c_n=mbstd_c_n, reslink=False, use_dropout=use_dropout,
            has_extra_final_layer=has_extra_final_layer)

    def init(self, key):
        keys = jax.random.split(key, len(self.encode_res) + 1)
        params = {f"b{res}": self.blocks[res].init(k)
                  for res, k in zip(self.encode_res[:-1], keys)}
        params["b4"] = self.b4.init(keys[-2])
        if self.mapping is not None:
            params["mapping"] = self.mapping.init(keys[-1])
        return params

    def __call__(self, params, img, c=None, rng=None, train=False):
        x = None
        feats = {}
        for resi in self.encode_res[:-1]:
            blk = self.blocks[resi]
            fn = (lambda p, x, img, blk=blk: blk(p, x, img))
            if self.remat:
                fn = jax.checkpoint(fn)
            x, feat = fn(params[f"b{resi}"], x, img)
            img = None
            feats[resi] = feat

        cmap = None
        if self.mapping is not None:
            cmap = self.mapping(params["mapping"], None, c)
        x, feat = self.b4(params["b4"], x, img, cmap, rng=rng, train=train)
        feats[4] = feat
        return x, feats
