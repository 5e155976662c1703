"""Batch inference engine: production serving of an inpainting generator.

The reference has no serving path — its ``*_loadgen`` datasets *consume* a
directory of pre-generated images (`/root/reference/lib/data_factory/
ds_ffhq.py:388-456`, CLI ``--evalnog_path`` at `cfg_helper.py:317,394-397`)
but nothing in the repo produces one.  This module is the producer, designed
for TPU serving rather than translated:

* **fixed compiled shapes** — one AOT-compiled forward per (batch, resolution);
  ragged final batches pad up and strip, so XLA never sees a dynamic shape;
* **async dispatch window** — device steps for batch *i+1* are enqueued while
  batch *i* is still in flight (JAX dispatch is asynchronous; the engine only
  syncs when a result is consumed), overlapping host IO with TPU compute;
* **on-device postprocess** — mask-composite + uint8 quantization inside the
  jit (the reference protocol, `shgan_default.py:257-262`), so readback is
  1 byte/px;
* **mesh-aware** — params replicate and batches shard over an existing
  ``jax.sharding.Mesh`` for multi-chip serving.

Determinism: per-image z and masks are keyed by (seed, global position) —
identical regardless of batch size or restart point.  Synthesis *noise*
(``noise_mode='random'``, the serving default) is keyed by (seed, batch
start) and drawn at batch shape, so it is reproducible for the same
(batch_size, start_index) layout but NOT invariant to re-batching; runs
that must be bit-stable across layouts should use
``noise_mode='const'``/``'none'``.
"""

from __future__ import annotations

import copy
import os
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp

from .parallel import create_mesh, replicated, shard_batch
from .models.infer import composite_forward, z_for_positions


def _as_model_input(images, masks):
    """Normalize user inputs to (real[-1,1] NCHW f32, mask NCHW f32 {0,1}).

    ``images``: [N,3,H,W] or [N,H,W,3]; uint8 [0,255] or float [-1,1].
    ``masks``:  [N,H,W] or [N,1,H,W]; bool / {0,1}; 0 = hole, 1 = keep
    (the sample-tuple contract, ds_ffhq.py:340-345).
    """
    images = np.asarray(images)
    masks = np.asarray(masks)
    if images.ndim != 4:
        raise ValueError(f"images must be 4D, got {images.shape}")
    if images.shape[-1] == 3 and images.shape[1] != 3:
        images = images.transpose(0, 3, 1, 2)
    if images.dtype != np.uint8:
        # uint8 passes through UNCHANGED: composite_forward normalizes on
        # device (models/infer.py u8 transport — 4× fewer host→device
        # bytes, bit-identical for uint8 sources; the link is the
        # serving path's main per-batch cost)
        images = images.astype(np.float32)
    if masks.ndim == 3:
        masks = masks[:, None]
    if masks.dtype != np.float32:
        masks = masks.astype(np.uint8)  # {0,1}; device casts to f32
    if images.shape[0] != masks.shape[0]:
        raise ValueError("images/masks batch mismatch")
    return images, masks


class InpaintEngine:
    """Compiled, batched inpainting inference on one model.

    Args:
        model_cfg: model-bank name (e.g. ``"shgan_g256"``) or a full model
            cfg dict.
        pretrained: optional ``.pth`` state_dict / ``.pkl`` snapshot path.
        batch_size: the compiled batch; requests pad up to it.
        mesh: optional existing mesh (default: all local devices, data axis).
        bf16: run blocks >16² in bfloat16 (the throughput config of
            ``bench.py``; parity runs keep fp32).
        noise_mode: 'random' (serving default, like reference eval,
            shgan_default.py:260) | 'const' | 'none'.
        seed: base seed for z/noise derivation.
    """

    def __init__(self, model_cfg, pretrained=None, batch_size=16, mesh=None,
                 bf16=False, noise_mode="random", seed=0, strict=True,
                 latency_batches=()):
        from .runtime.config import model_cfg_bank
        from .runtime.stages import build_generator

        if isinstance(model_cfg, str):
            model_cfg = model_cfg_bank()(model_cfg)
        if bf16:
            # deep copy: never mutate the caller's cfg dict (an fp32
            # parity engine built later from the same dict must stay fp32)
            model_cfg = copy.deepcopy(model_cfg)
            args = model_cfg["args"]
            args["encoder"]["args"]["use_fp16_before_res"] = 16
            args["synthesis"]["args"]["use_fp16_after_res"] = 16
        self.mesh = mesh if mesh is not None else create_mesh()
        n_dev = int(self.mesh.devices.size)
        # latency buckets: extra smaller compiled batches — a short request
        # pads only to the smallest bucket that fits instead of the full
        # throughput batch (each bucket costs one compile, cached by jit)
        self.buckets = sorted({int(b) for b in latency_batches}
                              | {int(batch_size)})
        for b in self.buckets:
            if b <= 0 or b % n_dev:
                raise ValueError(f"batch bucket {b} not divisible by "
                                 f"{n_dev} mesh devices")
        self.batch_size = batch_size
        self.noise_mode = noise_mode
        self.seed = seed
        self.G, params = build_generator(model_cfg, pretrained, strict=strict,
                                         seed=seed)
        self.params = jax.device_put(params, replicated(self.mesh))

        G = self.G

        @jax.jit
        def fwd(params, real, mask, z, rng_data):
            # the canonical eval/serving output protocol — shared with
            # the eval stage so generated dirs score identically
            rng = jax.random.wrap_key_data(rng_data)
            return composite_forward(G, params, real, mask, z, rng,
                                     noise_mode=noise_mode)

        # ONE jit for every (batch, H, W): jax.jit caches one executable
        # per input shape, so engines serving mixed resolutions/buckets
        # never re-pay the 15-25 min TPU compile for a shape seen before
        self._fwd = fwd

    # -- compiled forward ---------------------------------------------------

    def _z_for(self, global_indices):
        return z_for_positions(self.seed, self.G.z_dim, global_indices)

    def _run_padded(self, real, mask, z, batch_key):
        """Dispatch one full compiled batch; returns the device array
        (uint8 NCHW) WITHOUT syncing — callers strip padding after."""
        real, mask, z = shard_batch((real, mask, z), self.mesh)
        return self._fwd(self.params, real, mask, z,
                         np.asarray(jax.random.key_data(batch_key)))

    # -- public API ---------------------------------------------------------

    def inpaint(self, images, masks, start_index=0):
        """Inpaint a batch of any size; returns uint8 NCHW composites.

        ``start_index`` positions the batch in the deterministic z stream
        (use the global dataset offset so z/mask pairings agree between
        chunked and single-shot runs).

        Random noise is keyed by the chunk's global start and drawn at
        the compiled shape: identical runs reproduce exactly, but
        re-batching (a different batch_size, or a smaller latency bucket
        serving the same rows) changes the noise draw.  z and masks are
        layout-invariant; ``noise_mode='const'|'none'`` engines are fully
        layout-invariant.
        """
        real, mask = _as_model_input(images, masks)
        n, bs = real.shape[0], self.batch_size
        if n == 0:  # an endpoint forwarding an empty request gets an
            return np.zeros(real.shape, np.uint8)  # empty reply, not a crash
        outs = []
        for lo in range(0, n, bs):
            chunk_r = real[lo:lo + bs]
            chunk_m = mask[lo:lo + bs]
            k = chunk_r.shape[0]
            # smallest compiled bucket that fits this (tail) chunk
            tgt = next((b for b in self.buckets if b >= k), bs)
            if k < tgt:
                pad = [(0, tgt - k)] + [(0, 0)] * 3
                chunk_r = np.pad(chunk_r, pad)
                chunk_m = np.pad(chunk_m, pad, constant_values=1.0)
            gi = start_index + lo
            z = self._z_for(range(gi, gi + tgt))
            # noise key from the batch's global START (not gi // bs): a
            # run restarted at any start_index reproduces the same noise
            # for the same chunk boundaries
            key = jax.random.fold_in(jax.random.key(self.seed), gi)
            outs.append(np.asarray(
                self._run_padded(chunk_r, chunk_m, z, key))[:k])
        return np.concatenate(outs) if len(outs) > 1 else outs[0]

    def inpaint_stream(self, batches, start_index=0, window=2):
        """Stream (images, masks) batches through the engine.

        Yields uint8 NCHW composites per input batch, keeping up to
        ``window`` device batches in flight so host decode of batch i+1
        overlaps TPU compute of batch i.  Every input batch must have
        exactly ``batch_size`` rows except the last.
        """
        inflight = []  # [(device_array, valid_rows)]
        gi = start_index
        for images, masks in batches:
            real, mask = _as_model_input(images, masks)
            k, bs = real.shape[0], self.batch_size
            if k > bs:
                raise ValueError(f"stream batch {k} > engine batch {bs}")
            if k < bs:
                pad = [(0, bs - k)] + [(0, 0)] * 3
                real = np.pad(real, pad)
                mask = np.pad(mask, pad, constant_values=1.0)
            z = self._z_for(range(gi, gi + bs))
            key = jax.random.fold_in(jax.random.key(self.seed), gi)
            inflight.append((self._run_padded(real, mask, z, key), k))
            gi += k
            if len(inflight) > window:
                dev, valid = inflight.pop(0)
                yield np.asarray(dev)[:valid]
        for dev, valid in inflight:
            yield np.asarray(dev)[:valid]


def generate_to_dir(engine, dataset, formatter, out_dir, log_every=10,
                    num_threads=None, log=print):
    """Run a (real, mask, uid) eval dataset through the engine and write
    ``<uid>.png`` composites — exactly the directory layout the
    ``*_loadgen`` datasets / ``--evalnog_path`` flow consumes
    (data/datasets.py LoadGen, ds_ffhq.py:388-456).

    Uses :class:`~.data.pipeline.EvalPipeline` for the host side, so masks
    come from the same deterministic per-position RNG stream as a metric
    run over the same dataset — the generated directory scores identically
    under loadgen eval.
    """
    import timeit
    from PIL import Image
    from .data.pipeline import EvalPipeline

    os.makedirs(out_dir, exist_ok=True)
    n, bs = len(dataset), engine.batch_size
    pipe = EvalPipeline(dataset, formatter, bs, mesh=None,
                        seed=engine.seed, num_threads=num_threads)

    meta = []

    def batches():
        for real, mask, valid, uids in pipe:
            meta.append((valid, uids))
            yield real, mask

    t0 = timeit.default_timer()
    written = 0
    for bi, out in enumerate(engine.inpaint_stream(batches())):
        valid, uids = meta[bi]
        for img, uid, ok in zip(out, uids, valid):
            if not ok:  # padding rows of the final batch
                continue
            Image.fromarray(img.transpose(1, 2, 0)).save(
                osp.join(out_dir, f"{uid}.png"))
            written += 1
        if (bi + 1) % log_every == 0:
            log(f"generated {written}/{n}, {timeit.default_timer() - t0:.2f}s")
            t0 = timeit.default_timer()
    return written
