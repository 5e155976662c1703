"""Generator assemblies.

References:
  * StyleGAN2 generator (mapping → synthesis):
    `/root/reference/lib/model_zoo/stylegan.py:580-606`
  * CoModGAN generator (mapping → encoder → co-modulated synthesis):
    `/root/reference/lib/model_zoo/comodgan.py:435-481`
"""

from __future__ import annotations

import jax


class StyleGANGenerator:
    def __init__(self, mapping, synthesis):
        self.mapping = mapping
        self.synthesis = synthesis
        if self.synthesis.num_ws != self.mapping.num_ws:
            raise ValueError((self.synthesis.num_ws, self.mapping.num_ws))
        self.num_ws = mapping.num_ws
        self.z_dim = mapping.z_dim
        self.c_dim = mapping.c_dim
        self.w_dim = mapping.w_dim
        self.img_resolution = synthesis.resolution
        self.img_channels = synthesis.rgb_n

    def init(self, key):
        k0, k1 = jax.random.split(key)
        return {"mapping": self.mapping.init(k0),
                "synthesis": self.synthesis.init(k1)}

    def __call__(self, params, z, c=None, truncation_psi=1.0,
                 truncation_cutoff=None, noise_mode="random", rng=None):
        ws = self.mapping(params["mapping"], z, c,
                          truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.synthesis(params["synthesis"], ws,
                              noise_mode=noise_mode, rng=rng)


class CoModGANGenerator:
    """x is the 4-channel (mask−0.5 ‖ masked RGB) conditioning image."""

    def __init__(self, mapping, encoder, synthesis):
        self.mapping = mapping
        self.encoder = encoder
        self.synthesis = synthesis
        if self.synthesis.num_ws != self.mapping.num_ws:
            raise ValueError((self.synthesis.num_ws, self.mapping.num_ws))
        self.num_ws = mapping.num_ws
        self.z_dim = mapping.z_dim
        self.c_dim = mapping.c_dim
        self.w_dim = mapping.w_dim
        self.ic_n = encoder.ic_n
        self.img_resolution = synthesis.resolution
        self.img_channels = synthesis.rgb_n

    def init(self, key):
        k0, k1, k2 = jax.random.split(key, 3)
        return {"mapping": self.mapping.init(k0),
                "encoder": self.encoder.init(k1),
                "synthesis": self.synthesis.init(k2)}

    def __call__(self, params, x, z, c=None, truncation_psi=1.0,
                 truncation_cutoff=None, noise_mode="random", rng=None,
                 train=False):
        rngs = (jax.random.split(rng, 2) if rng is not None else (None, None))
        ws = self.mapping(params["mapping"], z, c,
                          truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        x_global, feats = self.encoder(params["encoder"], x, rng=rngs[0],
                                       train=train)
        feats = self._match_fold_layout(feats)
        return self.synthesis(params["synthesis"], x_global, feats, ws,
                              noise_mode=noise_mode, rng=rngs[1])

    def _match_fold_layout(self, feats):
        """Encoder and synthesis may run the space-to-depth folded domain
        (ops/folded.py) with DIFFERENT ``fold_above_res`` thresholds — e.g.
        folding only the MXU-starved encoder side at 512² (the synthesis
        up-convs pay 4× nominal FLOPs folded, the encoder down-convs ~1×).
        Re-lay skip features at levels where the two sides disagree."""
        ef = getattr(self.encoder, "fold_above_res", None)
        sf = getattr(self.synthesis, "fold_above_res", None)
        if ef == sf:
            return feats
        from ..ops.folded import fold, unfold
        out = dict(feats)
        for r, v in feats.items():
            enc_folded = ef is not None and r > ef
            syn_folded = sf is not None and r > sf
            if enc_folded and not syn_folded:
                out[r] = unfold(v)
            elif syn_folded and not enc_folded:
                out[r] = fold(v)
        return out
