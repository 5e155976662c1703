"""StyleGAN2 and CoModGAN synthesis networks.

References:
  * stylegan synthesis block / pyramid:
    `/root/reference/lib/model_zoo/stylegan.py:436-578`
  * comodgan first block (global-code fc → 4×4 grid + encoder skip):
    `/root/reference/lib/model_zoo/comodgan.py:207-262`
  * comodgan co-modulated blocks (style = concat[w_i, w0]):
    `/root/reference/lib/model_zoo/comodgan.py:264-340`
  * comodgan synthesis pyramid: `/root/reference/lib/model_zoo/comodgan.py:342-433`
  * pluralistic variant: `/root/reference/lib/model_zoo/comodgan.py:491-513`

Co-modulation design note: the reference concatenates the 512-d mapping
style with the 1024-d encoder global code into a 1536-d ``w_long`` for every
affine.  We keep that contract (checkpoint compatible), and the downstream
modulated conv never materializes per-sample weights (see
``ops.modulated_conv``), so co-modulation costs one [N,1536]×[1536,C] matmul
per conv on the MXU.

RNG: each noise-injecting conv gets a key derived from a single per-call rng
via ``jax.random.fold_in`` with a static per-layer counter.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.upfirdn2d import setup_filter, upsample2d
from ..parallel.spatial import constrain as spatial_constrain
from .layers import Dense, Conv2dLayer, SynthesisLayer, ToRGBLayer


def _layer_rng(rng, salt):
    return None if rng is None else jax.random.fold_in(rng, salt)


class StyleGANSynthesisBlock:
    """One resolution level of StyleGAN2 synthesis
    (reference ``synthesis_block``, stylegan.py:436-520)."""

    def __init__(self, ic_n, oc_n, w_dim, resolution, rgb_n=None,
                 resample_filter=(1, 3, 3, 1),
                 activation="lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)",
                 res_link=False, use_fp16=False):
        self.ic_n = ic_n
        self.oc_n = oc_n
        self.w_dim = w_dim
        self.resolution = resolution
        self.res_link = res_link
        self.dtype = jnp.bfloat16 if use_fp16 else jnp.float32
        self.resample_filter = setup_filter(resample_filter)

        self.num_conv = 0
        self.num_torgb = 0
        self.conv0 = None
        self.has_const = ic_n == 0
        if not self.has_const:
            self.conv0 = SynthesisLayer(
                ic_n, oc_n, 3, w_dim=w_dim, resolution=resolution, up=2,
                activation=activation, resample_filter=resample_filter,
                use_noise=True)
            self.num_conv += 1
        self.conv1 = SynthesisLayer(
            oc_n, oc_n, 3, w_dim=w_dim, resolution=resolution, up=1,
            activation=activation, resample_filter=None, use_noise=True)
        self.num_conv += 1
        self.torgb = None
        if rgb_n is not None:
            self.torgb = ToRGBLayer(oc_n, rgb_n, 1, w_dim=w_dim)
            self.num_torgb += 1
        self.skip = None
        if ic_n != 0 and res_link:
            self.skip = Conv2dLayer(ic_n, oc_n, kernel_size=1, bias=False,
                                    up=2, resample_filter=resample_filter)

    def init(self, key):
        keys = jax.random.split(key, 5)
        params = {}
        if self.has_const:
            params["const"] = jax.random.normal(
                keys[0], (self.oc_n, self.resolution, self.resolution),
                jnp.float32)
        else:
            params["conv0"] = self.conv0.init(keys[1])
        params["conv1"] = self.conv1.init(keys[2])
        if self.torgb is not None:
            params["torgb"] = self.torgb.init(keys[3])
        if self.skip is not None:
            params["skip"] = self.skip.init(keys[4])
        return params

    def __call__(self, params, x, img, ws, noise_mode="random", rng=None):
        if self.has_const:
            x = jnp.broadcast_to(
                params["const"].astype(self.dtype)[None],
                (ws.shape[0],) + params["const"].shape)
        else:
            x = x.astype(self.dtype)

        y = None
        if self.res_link and self.skip is not None:
            y = self.skip(params["skip"], x, gain=np.sqrt(0.5))

        w_idx = 0
        if self.conv0 is not None:
            x = self.conv0(params["conv0"], x, ws[:, w_idx],
                           noise_mode=noise_mode, rng=_layer_rng(rng, 0))
            w_idx += 1
        if self.res_link:
            x = self.conv1(params["conv1"], x, ws[:, w_idx],
                           gain=np.sqrt(0.5), noise_mode=noise_mode,
                           rng=_layer_rng(rng, 1))
            # ic_n=0 builds no skip branch (nothing to add); reference
            # configs never hit that combination, but don't crash on it
            x = y + x if y is not None else x
        else:
            x = self.conv1(params["conv1"], x, ws[:, w_idx],
                           noise_mode=noise_mode, rng=_layer_rng(rng, 1))
        w_idx += 1

        if img is not None:
            img = upsample2d(img, self.resample_filter)
        if self.torgb is not None:
            y = self.torgb(params["torgb"], x, ws[:, w_idx])
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        # opt-in spatial sharding (parallel/spatial.py): no-op unless the
        # spatial_sharding() context is active on a model-axis>1 mesh
        return spatial_constrain(x), spatial_constrain(img)


class StyleGANSynthesis:
    """Resolution pyramid 4² → resolution
    (reference ``Synthesis``, stylegan.py:522-578)."""

    def __init__(self, w_dim=512, resolution=256, rgb_n=3, ch_base=16384,
                 ch_max=512, use_fp16_after_res=16,
                 resample_filter=(1, 3, 3, 1),
                 activation="lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)"):
        log2res = int(np.log2(resolution))
        if 2 ** log2res != resolution:
            raise ValueError(resolution)
        self.w_dim = w_dim
        self.resolution = resolution
        self.rgb_n = rgb_n
        self.block_res = [2 ** i for i in range(2, log2res + 1)]

        self.blocks = {}
        self.num_ws = 0
        for resi, resj in zip([None] + self.block_res[:-1], self.block_res):
            ch_i = min(ch_base // resi, ch_max) if resi is not None else 0
            ch_j = min(ch_base // resj, ch_max)
            use_fp16 = (use_fp16_after_res is not None
                        and resj > use_fp16_after_res)
            block = StyleGANSynthesisBlock(
                ch_i, ch_j, w_dim=w_dim, resolution=resj, rgb_n=rgb_n,
                resample_filter=resample_filter, activation=activation,
                res_link=False, use_fp16=use_fp16)
            self.num_ws += block.num_conv
            if resj == self.block_res[-1]:
                self.num_ws += block.num_torgb
            self.blocks[resj] = block

    def init(self, key):
        keys = jax.random.split(key, len(self.block_res))
        return {f"b{res}": self.blocks[res].init(k)
                for res, k in zip(self.block_res, keys)}

    def __call__(self, params, ws, noise_mode="random", rng=None):
        ws = ws.astype(jnp.float32)
        x = img = None
        w_idx = 0
        for res in self.block_res:
            block = self.blocks[res]
            cur_ws = ws[:, w_idx: w_idx + block.num_conv + block.num_torgb]
            w_idx += block.num_conv
            x, img = block(params[f"b{res}"], x, img, cur_ws,
                           noise_mode=noise_mode, rng=_layer_rng(rng, res))
        return img


# ---------------------------------------------------------------------------
# CoModGAN synthesis
# ---------------------------------------------------------------------------

class CoModSynthesisBlockFirst:
    """4×4 block: fc(global code) → grid, plus encoder skip; styles are
    co-modulated concat[w, w0] (reference ``synthesis_block_first``,
    comodgan.py:207-262)."""

    def __init__(self, w0_dim, oc_n, w_dim, resolution=4, rgb_n=None,
                 activation="lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)"):
        self.resolution = resolution
        self.oc_n = oc_n
        self.fc = Dense(w0_dim, oc_n * resolution ** 2, activation=activation)
        self.num_conv = 1
        self.num_torgb = 0
        self.conv = SynthesisLayer(oc_n, oc_n, 3, w0_dim + w_dim,
                                   resolution=resolution, bias=True,
                                   activation=activation)
        self.torgb = None
        if rgb_n is not None:
            self.torgb = ToRGBLayer(oc_n, rgb_n, 1, w0_dim + w_dim)
            self.num_torgb = 1

    def init(self, key):
        keys = jax.random.split(key, 3)
        params = {"fc": self.fc.init(keys[0]),
                  "conv": self.conv.init(keys[1])}
        if self.torgb is not None:
            params["torgb"] = self.torgb.init(keys[2])
        return params

    def __call__(self, params, x, x0, ws, noise_mode="random", rng=None):
        x = x.astype(jnp.float32)
        x0 = x0.astype(jnp.float32)
        w0 = x
        x = self.fc(params["fc"], x)
        x = x.reshape(x.shape[0], -1, self.resolution, self.resolution)
        x = x + x0

        w_long = jnp.concatenate([ws[:, 0], w0], axis=1)
        x = self.conv(params["conv"], x, w_long, noise_mode=noise_mode,
                      rng=_layer_rng(rng, 0))
        img = None
        if self.torgb is not None:
            w_long = jnp.concatenate([ws[:, 1], w0], axis=1)
            img = self.torgb(params["torgb"], x, w_long)
        return x, img


class CoModSynthesisBlock:
    """Upsampling co-modulated block with encoder skip add
    (reference comodgan ``synthesis_block``, comodgan.py:264-340)."""

    def __init__(self, ic_n, oc_n, w_dim, w0_dim, resolution, rgb_n,
                 resample_filter=(1, 3, 3, 1),
                 activation="lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)",
                 res_link=False, use_fp16=False, folded=False):
        if ic_n == 0:
            raise ValueError
        self.resolution = resolution
        self.res_link = res_link
        # folded: run this level in the space-to-depth domain
        # (ops/folded.py) — exact; conv0's folded up-conv never
        # interleaves its phases, conv1/torgb stay folded, the img
        # pyramid upsample produces folded RGB, and the img is unfolded
        # once before return.  The encoder skip x0 must arrive folded
        # (same fold_above_res on both sides).
        self.folded = folded
        assert not (folded and res_link), "folded res_link not implemented"
        self.dtype = jnp.bfloat16 if use_fp16 else jnp.float32
        self.resample_filter = setup_filter(resample_filter)
        self.num_conv = 2
        self.num_torgb = 0

        self.conv0 = SynthesisLayer(
            ic_n, oc_n, 3, w_dim=w_dim + w0_dim, resolution=resolution, up=2,
            activation=activation, resample_filter=resample_filter,
            use_noise=True)
        self.conv1 = SynthesisLayer(
            oc_n, oc_n, 3, w_dim=w_dim + w0_dim, resolution=resolution, up=1,
            activation=activation, resample_filter=None, use_noise=True)
        self.torgb = None
        if rgb_n is not None:
            self.torgb = ToRGBLayer(oc_n, rgb_n, 1, w_dim=w_dim + w0_dim)
            self.num_torgb = 1
        self.skip = None
        if res_link:
            self.skip = Conv2dLayer(ic_n, oc_n, kernel_size=1, bias=False,
                                    up=2, resample_filter=resample_filter)

    def init(self, key):
        keys = jax.random.split(key, 4)
        params = {"conv0": self.conv0.init(keys[0]),
                  "conv1": self.conv1.init(keys[1])}
        if self.torgb is not None:
            params["torgb"] = self.torgb.init(keys[2])
        if self.skip is not None:
            params["skip"] = self.skip.init(keys[3])
        return params

    def __call__(self, params, x, x0, img, ws, w0, noise_mode="random",
                 rng=None):
        if self.folded:
            return self._call_folded(params, x, x0, img, ws, w0,
                                     noise_mode=noise_mode, rng=rng)
        x = x.astype(self.dtype)
        x0 = x0.astype(self.dtype)

        if self.res_link:
            y = self.skip(params["skip"], x, gain=np.sqrt(0.5))
            w_long = jnp.concatenate([ws[:, 0], w0], axis=1)
            x = self.conv0(params["conv0"], x, w_long, noise_mode=noise_mode,
                           rng=_layer_rng(rng, 0))
            x = x + x0
            w_long = jnp.concatenate([ws[:, 1], w0], axis=1)
            x = self.conv1(params["conv1"], x, w_long, gain=np.sqrt(0.5),
                           noise_mode=noise_mode, rng=_layer_rng(rng, 1))
            x = y + x
        else:
            w_long = jnp.concatenate([ws[:, 0], w0], axis=1)
            x = self.conv0(params["conv0"], x, w_long, noise_mode=noise_mode,
                           rng=_layer_rng(rng, 0))
            x = x + x0
            w_long = jnp.concatenate([ws[:, 1], w0], axis=1)
            x = self.conv1(params["conv1"], x, w_long, noise_mode=noise_mode,
                           rng=_layer_rng(rng, 1))

        if img is not None:
            img = upsample2d(img, self.resample_filter)
        if self.torgb is not None:
            w_long = jnp.concatenate([ws[:, 2], w0], axis=1)
            y = self.torgb(params["torgb"], x, w_long).astype(jnp.float32)
            img = img + y if img is not None else y
        return spatial_constrain(x), spatial_constrain(img)

    def _call_folded(self, params, x, x0, img, ws, w0, noise_mode="random",
                     rng=None):
        """Folded-domain block (ops/folded.py): identical math in the
        phase-major space-to-depth layout.  x enters UNFOLDED at the
        coarse resolution (conv0's folded up-conv folds for free), x0
        must arrive folded.  The 3-channel img pyramid stays UNFOLDED
        (its depthwise FIR is bandwidth-trivial; only torgb's output is
        unfolded, one small fp32 transpose per folded level)."""
        from ..ops.folded import unfold
        x = x.astype(self.dtype)
        if x.shape[1] == 4 * self.conv0.in_channels:
            x = unfold(x)  # previous level was folded too
        x0 = x0.astype(self.dtype)

        w_long = jnp.concatenate([ws[:, 0], w0], axis=1)
        x = self.conv0(params["conv0"], x, w_long, noise_mode=noise_mode,
                       rng=_layer_rng(rng, 0), folded_out=True)
        x = x + x0
        w_long = jnp.concatenate([ws[:, 1], w0], axis=1)
        x = self.conv1(params["conv1"], x, w_long, noise_mode=noise_mode,
                       rng=_layer_rng(rng, 1), folded_in=True,
                       folded_out=True)

        if img is not None:
            img = upsample2d(img, self.resample_filter)
        if self.torgb is not None:
            w_long = jnp.concatenate([ws[:, 2], w0], axis=1)
            y = self.torgb(params["torgb"], x, w_long, folded=True)
            y = unfold(y.astype(jnp.float32))
            img = img + y if img is not None else y
        # keep the opt-in spatial-sharding annotations on folded levels
        # too (no-op when inactive) — ADVICE r4
        return spatial_constrain(x), spatial_constrain(img)


class CoModSynthesis:
    """CoModGAN synthesis pyramid (reference comodgan ``Synthesis``,
    comodgan.py:342-433)."""

    plural = False  # Synthesis_Plur overrides

    def __init__(self, w_dim=512, w0_dim=1024, resolution=256, rgb_n=3,
                 ch_base=16384, ch_max=512, use_fp16_after_res=16,
                 resample_filter=(1, 3, 3, 1),
                 activation="lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)",
                 remat=False, fold_above_res=None):
        self.remat = remat  # per-block jax.checkpoint (see encoder.Encoder)
        # fold_above_res: space-to-depth folded domain for blocks at
        # resolution > this (see encoder.Encoder.fold_above_res; must
        # match the encoder's value so the skip feats line up)
        self.fold_above_res = fold_above_res
        log2res = int(np.log2(resolution))
        if 2 ** log2res != resolution:
            raise ValueError(resolution)
        self.w_dim = w_dim
        self.w0_dim = w0_dim
        self.resolution = resolution
        self.rgb_n = rgb_n
        self.block_res = [2 ** i for i in range(2, log2res + 1)]
        # the reference hard-codes num_ws per resolution (comodgan.py:367-372);
        # those values equal 2·len(block_res) (b4 consumes 1 conv w + the
        # final torgb w, every other block 2 conv ws), which we use so that
        # resolutions below 256 also work.
        self.num_ws = 2 * len(self.block_res)
        assert self.num_ws == {256: 14, 512: 16, 1024: 18}.get(
            resolution, self.num_ws)

        hidden_ch = min(ch_base // self.block_res[0], ch_max)
        self.blocks = {4: CoModSynthesisBlockFirst(
            w0_dim, hidden_ch, w_dim, resolution=4, rgb_n=rgb_n,
            activation=activation)}
        for resi, resj in zip(self.block_res[:-1], self.block_res[1:]):
            ch_i = min(ch_base // resi, ch_max)
            ch_j = min(ch_base // resj, ch_max)
            use_fp16 = (use_fp16_after_res is not None
                        and resj > use_fp16_after_res)
            self.blocks[resj] = CoModSynthesisBlock(
                ch_i, ch_j, w_dim=w_dim, w0_dim=w0_dim, resolution=resj,
                rgb_n=rgb_n, resample_filter=resample_filter,
                activation=activation, res_link=False, use_fp16=use_fp16,
                folded=(fold_above_res is not None
                        and resj > fold_above_res))

    def init(self, key):
        keys = jax.random.split(key, len(self.block_res))
        return {f"b{res}": self.blocks[res].init(k)
                for res, k in zip(self.block_res, keys)}

    def __call__(self, params, x, feats, ws, noise_mode="random", rng=None):
        ws = ws.astype(jnp.float32)
        block_ws = []
        w_idx = 0
        for res in self.block_res:
            block = self.blocks[res]
            block_ws.append(ws[:, w_idx: w_idx + block.num_conv
                               + block.num_torgb])
            w_idx += block.num_conv

        w0 = x
        if self.plural:
            # pluralistic variant adds multiplicative noise to the global
            # code (comodgan.py:505-506).  The reference draws fresh randn
            # even in eval; with rng=None (deterministic noise_mode) the
            # draw is keyed constant so const/none eval still works
            kr = (jax.random.fold_in(rng, -1) if rng is not None
                  else jax.random.key(0))
            w0 = w0 + jax.random.normal(kr, w0.shape, w0.dtype) * w0

        # note: b4 always receives the un-noised global code; only the
        # co-modulation of later blocks uses the noised w0 (comodgan.py:505-507)
        x, img = self.blocks[4](params["b4"], x, feats[4], block_ws[0],
                                noise_mode=noise_mode,
                                rng=_layer_rng(rng, 4))
        for res, cur_ws in zip(self.block_res[1:], block_ws[1:]):
            blk = self.blocks[res]
            r = _layer_rng(rng, res)
            fn = (lambda p, x, x0, img, ws_, w0_, r_, blk=blk:
                  blk(p, x, x0, img, ws_, w0_, noise_mode=noise_mode,
                      rng=r_))
            if self.remat:
                fn = jax.checkpoint(fn)
            x, img = fn(params[f"b{res}"], x, feats[res], img, cur_ws, w0, r)
        return img


class CoModSynthesisPlur(CoModSynthesis):
    """Pluralistic-inpainting variant (comodgan.py:491-513)."""
    plural = True
