"""Perceptual path length evaluator (generator-in-the-loop).

Reference: `/root/reference/lib/evaluator/stylegan_metrics/
perceptual_path_length.py` (registered as ppl2_wend / ppl_{z,w}{full,end},
`metric_main.py:153-156,183-203`).  PPL perturbs the latent by ±ε/2 along a
random interpolation and measures the squared LPIPS distance / ε² of the
two rendered images, with a 1%/99% tail filter.

Adaptations for the inpainting generator + TPU:
  * The generator is conditional — each sample renders against a fixed
    (mask ‖ masked-image) context collected from the eval stream, with the
    encoder pass shared by both perturbations.
  * The reference randomizes the ``noise_const`` buffers once per pair
    batch so t0/t1 share noise; here both synthesis calls reuse the SAME
    rng with ``noise_mode='random'``, which equally makes noise common to
    the pair (and additionally decorrelates it across batch lanes).
  * The LPIPS embedding defaults to ``net='vgg16'`` — the reference's
    backbone choice (vgg16 ``return_lpips``, perceptual_path_length.py:
    41-48) — loaded torch-free from SHGAN_TPU_VGG16 + the lpips vgg lin
    weights; matching NVIDIA's absolute values additionally requires the
    caffe-VGG weights converted from the metric ``vgg16.pt``
    (tools/convert_vgg16.py).  ``net='alex'`` remains available (same
    construction, different backbone).  Both perturbations run in one
    jitted function.
  * ``max_contexts`` bounds the pool of conditioning contexts held in
    host memory; a run with ``num_samples > max_contexts`` RECYCLES
    contexts (``idx % len(ctx)``), whereas the reference draws a fresh
    batch per sample (perceptual_path_length.py:107-125) — raise
    ``max_contexts`` to ≥ num_samples for protocol-exact runs.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp

from .base import BaseEvaluator, register_evaluator
from .lpips import lpips_distance
from .stylegan_metrics import ppl_from_distances


def slerp_jnp(a, b, t):
    """Spherical interpolation (perceptual_path_length.py:22-31)."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = (a * b).sum(axis=-1, keepdims=True)
    p = t * jnp.arccos(jnp.clip(d, -1.0, 1.0))
    c = b - d * a
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    out = a * jnp.cos(p) + c * jnp.sin(p)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def make_ppl_sampler(G, lpips_params, epsilon=1e-4, space="w",
                     sampling="end", crop=False, net="alex"):
    """→ jitted (params, x, z0, z1, t, rng) → [N] PPL distances
    (the PPLSampler.forward equivalent, perceptual_path_length.py:36-95)."""
    assert space in ("z", "w") and sampling in ("full", "end")

    def sample(params, x, z0, z1, t, rng):
        if space == "w":
            ws0 = G.mapping(params["mapping"], z0)
            ws1 = G.mapping(params["mapping"], z1)
            tt = t[:, None, None]
            wt0 = ws0 + (ws1 - ws0) * tt
            wt1 = ws0 + (ws1 - ws0) * (tt + epsilon)
        else:
            zt0 = slerp_jnp(z0, z1, t[:, None])
            zt1 = slerp_jnp(z0, z1, t[:, None] + epsilon)
            wt0 = G.mapping(params["mapping"], zt0)
            wt1 = G.mapping(params["mapping"], zt1)
        x_global, feats = G.encoder(params["encoder"], x)
        img0 = G.synthesis(params["synthesis"], x_global, feats, wt0,
                           noise_mode="random", rng=rng)
        img1 = G.synthesis(params["synthesis"], x_global, feats, wt1,
                           noise_mode="random", rng=rng)
        img = jnp.concatenate([img0, img1], axis=0)
        if crop:  # center crop (perceptual_path_length.py:71-74)
            c = img.shape[2] // 8
            img = img[:, :, c * 3:c * 7, c * 2:c * 6]
        factor = img.shape[2] // 256
        if factor > 1:  # box-downsample to 256 (line 77-79)
            n, ch, h, w = img.shape
            img = img.reshape(n, ch, h // factor, factor, w // factor,
                              factor).mean(axis=(3, 5))
        d0, d1 = jnp.split(img, 2, axis=0)
        return lpips_distance(lpips_params, d0, d1, net=net) \
            / (epsilon ** 2)

    return jax.jit(sample)


@register_evaluator("ppl")
class PPLEvaluator(BaseEvaluator):
    """Config surface mirrors the reference's registered variants:
    ``space`` ('w'|'z'), ``sampling`` ('end'|'full'), ``crop`` — e.g.
    ppl2_wend = dict(space='w', sampling='end', crop=False)."""

    needs_generator = True

    def __init__(self, num_samples=2000, epsilon=1e-4, space="w",
                 sampling="end", crop=False, batch_size=8, net="vgg16",
                 alexnet_weights=None, vgg16_weights=None, lin_weights=None,
                 lpips_params=None, max_contexts=256, **_):
        super().__init__()
        self.num_samples = num_samples
        self.epsilon = epsilon
        self.space = space
        self.sampling = sampling
        self.crop = crop
        self.batch_size = batch_size
        self.net = net
        self.max_contexts = max_contexts
        if lpips_params is not None:
            self.lpips_params = lpips_params
        else:
            # default net='vgg16' — the reference PPL's embedding
            # (perceptual_path_length.py:41-48); net='alex' reuses the
            # LPIPS-metric assets instead
            from .lpips import resolve_lpips_params
            try:
                self.lpips_params = resolve_lpips_params(
                    net, alexnet_weights=alexnet_weights,
                    vgg16_weights=vgg16_weights, lin_weights=lin_weights)
            except FileNotFoundError as e:
                if net != "vgg16":
                    raise
                # setups provisioned only with the LPIPS-metric alex
                # assets keep working — loudly, since absolute PPL is
                # then NOT comparable to the reference's vgg16 protocol
                try:
                    self.lpips_params = resolve_lpips_params(
                        "alex", alexnet_weights=alexnet_weights,
                        lin_weights=lin_weights)
                except FileNotFoundError:
                    raise e from None
                self.net = net = "alex"
                from ..runtime.logging import print_log
                print_log(
                    "PPL: vgg16 LPIPS weights not found — falling back to "
                    "net=alex (absolute PPL not comparable to the "
                    "reference's vgg16 embedding; set SHGAN_TPU_VGG16 + "
                    "SHGAN_TPU_LPIPS_LIN_VGG for protocol-exact runs)")
        self._contexts = []  # [C,H,W] float32 generator inputs (mask‖masked)
        self.data_dist = []

    def add_batch(self, real, mask=None, valid=None, **_):
        """Collect conditional contexts from the eval stream.  ``real`` is
        0..255; ``mask`` is the {0,1} hole mask ([N,1,H,W])."""
        if mask is None or len(self._contexts) >= self.max_contexts:
            return
        real = np.asarray(real, np.float32) / 127.5 - 1.0
        mask = np.asarray(mask, np.float32)
        x = np.concatenate([mask - 0.5, real * mask], axis=1)
        (x,) = self._apply_valid([x], valid)
        take = self.max_contexts - len(self._contexts)
        self._contexts.extend(np.asarray(x)[:take])

    def run_generator_metrics(self, G, params, seed=0):
        """Sampling loop (perceptual_path_length.py:107-125)."""
        if jax.process_count() > 1:
            raise NotImplementedError(
                "PPL is single-process: conditioning contexts are "
                "process-local and the sampler output would span "
                "non-addressable devices (the reference's PPL lives in "
                "its dead stylegan_metrics package — there is no "
                "multi-host protocol to match); run the ppl evaluator "
                "in a single-process eval")
        if not self._contexts:
            raise RuntimeError(
                "PPL has no conditional contexts: add_batch with mask= must "
                "run before run_generator_metrics")
        sampler = make_ppl_sampler(G, self.lpips_params, self.epsilon,
                                   self.space, self.sampling, self.crop,
                                   net=self.net)
        ctx = np.stack(self._contexts)
        key = jax.random.key(seed)
        bs = self.batch_size
        for start in range(0, self.num_samples, bs):
            key, kz, kt, kn = jax.random.split(key, 4)
            idx = np.arange(start, start + bs) % len(ctx)
            x = jnp.asarray(ctx[idx])
            z = jax.random.normal(kz, (2 * bs, G.z_dim))
            z0, z1 = jnp.split(z, 2, axis=0)
            t = (jax.random.uniform(kt, (bs,))
                 if self.sampling == "full" else jnp.zeros((bs,)))
            d = np.asarray(sampler(params, x, z0, z1, t, kn), np.float64)
            self.data_dist.append(d)

    def compute(self):
        if not self.data_dist:
            self.final["ppl"] = float("nan")
            return self.final["ppl"]
        dist = np.concatenate(self.data_dist)[:self.num_samples]
        self.final["ppl"] = ppl_from_distances(dist)
        return self.final["ppl"]

    def one_line_summary(self):
        self._log("Evaluator ppl: {:.4f}".format(self.final["ppl"]))

    def clear_data(self):
        self._contexts = []
        self.data_dist = []
