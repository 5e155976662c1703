"""Execution stages: the production eval path and the training loop.

Reference call stack (SURVEY §3.1): ``main.py`` → config bank →
``exec_container`` (one process per GPU, NCCL) → ``shgan_default.eval_stage``
(`/root/reference/lib/experiments/shgan_default.py:127-303`).  Here a single
controller drives the whole mesh: the stage builds a ('data','model') mesh,
jits the generator across it, streams mesh-sharded batches from the host
pipeline, and feeds the evaluator stack with validity masks instead of
rank-interleaved gathers.
"""

from __future__ import annotations

import copy
import os
import os.path as osp
import timeit

import numpy as np
import jax
import jax.numpy as jnp

from ..models import get_model
from ..data import get_dataset
from ..data.formatters import get_formatter
from ..data.transforms import wrap_formatter
from ..data.pipeline import EvalPipeline, TrainPipeline
from ..parallel import create_mesh, replicated, local_rows, is_lead
from ..eval import get_evaluator
from ..checkpoint import (load_torch_pth, torch_state_dict_to_params,
                          load_network_snapshot)
from .logging import print_log, ScalarLogger


def build_generator(cfg_model, pretrained_pth=None, strict=True, seed=0,
                    snapshot_key="G_ema"):
    """Model + params, optionally loading a reference ``.pth`` state_dict
    (shgan_default.py:221-226) or a training-snapshot ``.pkl``
    ``{G, D, G_ema, augment_pipe}`` container (stylegan_default.py:506-532,
    708-716 — the reference consumes it via copy_params_and_buffers with
    require_all=False, i.e. a non-strict merge)."""
    from .fold_policy import apply_fold_policy
    cfg_model = apply_fold_policy(cfg_model)   # TPU >=1024² folded default
    G = get_model(cfg_model)
    params = G.init(jax.random.key(seed))
    if pretrained_pth is not None:
        if not osp.isfile(pretrained_pth):
            raise FileNotFoundError(pretrained_pth)
        if pretrained_pth.endswith(".pkl"):
            data, is_tf = load_network_snapshot(pretrained_pth)
            sd = data[snapshot_key]
            if is_tf:
                # legacy TF CoModGAN warm start: tf-slash → torch-dot
                # names (the reference ships the unpickler but no remap,
                # stylegan_default.py:591-626 — its TF path dead-ends)
                from ..checkpoint import tf_params_to_torch_state_dict
                sd, unmatched = tf_params_to_torch_state_dict(sd)
                if unmatched:
                    print_log(f"TF pickle: {len(unmatched)} unmatched "
                              f"variables (first: {unmatched[:4]})")
            loaded = torch_state_dict_to_params(sd)
            params = _merge_params(params, loaded, strict=False)
        else:
            sd = load_torch_pth(pretrained_pth)
            loaded = torch_state_dict_to_params(sd)
            params = _merge_params(params, loaded, strict=strict)
        print_log(f"Load from [{pretrained_pth}] strict_sd [{strict}]")
    return G, params


def _merge_params(params, loaded, strict=True, path=""):
    """Non-strict load = update matching keys (get_model.py:10-22)."""
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):
            out[k] = _merge_params(v, loaded.get(k, {}), strict,
                                   f"{path}{k}.")
        elif k in loaded:
            lv = jnp.asarray(np.asarray(loaded[k]), jnp.float32)
            assert lv.shape == v.shape, (path + k, lv.shape, v.shape)
            out[k] = lv
        else:
            if strict:
                raise KeyError(f"missing key in checkpoint: {path}{k}")
            out[k] = v
    if strict:
        extra = set(loaded) - set(params)
        if extra:
            raise KeyError(f"unexpected checkpoint keys at {path!r}: "
                           f"{sorted(extra)[:8]}")
    return out


def save_image_grid(images, path, drange=(-1, 1), grid_size=(8, 6)):
    """Tile NCHW images into one PNG (reference grid tiler,
    stylegan_default.py:74-91)."""
    from PIL import Image
    lo, hi = drange
    imgs = np.asarray(images, np.float32)
    imgs = (imgs - lo) / (hi - lo) * 255
    imgs = np.rint(imgs).clip(0, 255).astype(np.uint8)
    gw, gh = grid_size
    n, c, h, w = imgs.shape
    grid = np.zeros((c, gh * h, gw * w), np.uint8)
    for i in range(min(n, gw * gh)):
        y, x = divmod(i, gw)
        grid[:, y * h:(y + 1) * h, x * w:(x + 1) * w] = imgs[i]
    grid = grid.transpose(1, 2, 0)
    if c == 1:
        grid = grid[:, :, 0]
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    Image.fromarray(grid).save(path)


def draw_demo_grid(G, params, dataset, formatter, log_dir, z_dim,
                   grid_size=(8, 6), batch=16, seed=0,
                   subfolder="demo", filename="fakes.png"):
    """Demo grid writer: fakes / fakes_combined / masks / reals / erased
    (reference draw_functor, shgan_default.py:27-121)."""
    n = grid_size[0] * grid_size[1]
    rng = np.random.RandomState(seed)
    reals, masks = [], []
    for i in range(n):
        r, m, _ = formatter(dataset[i % len(dataset)])
        r = np.asarray(r)
        if r.dtype == np.uint8:
            # u8-transport formatters return 0..255 (data/sampler.py
            # contract); the demo path normalizes on the host
            r = r.astype(np.float32) / 127.5 - 1.0
        reals.append(np.asarray(r, np.float32))
        masks.append(np.asarray(m, np.float32))
    real = np.stack(reals)
    mask = np.stack(masks)[:, None]
    erased = real * mask
    x = np.concatenate([mask - 0.5, erased], axis=1)
    z = rng.randn(n, z_dim).astype(np.float32)

    # memoize the jitted demo forward ON the model: the training loop
    # draws a grid every image-snapshot tick, and a fresh jit wrapper per
    # call would retrace (and re-compile, 15-25 min per full-size TPU
    # compile through the remote helper) every time
    fwd = getattr(G, "_demo_fwd", None)
    if fwd is None:
        fwd = jax.jit(lambda p, x, z: G(p, x, z, noise_mode="const"))
        try:
            G._demo_fwd = fwd
        except AttributeError:
            pass
    fakes = []
    for i in range(0, n, batch):
        fakes.append(np.asarray(fwd(params, jnp.asarray(x[i:i + batch]),
                                    jnp.asarray(z[i:i + batch]))))
    fake = np.concatenate(fakes)

    out = osp.join(log_dir, subfolder)
    save_image_grid(fake, osp.join(out, filename), (-1, 1), grid_size)
    combined = real * mask + fake * (1 - mask)
    stem, ext = osp.splitext(filename)
    save_image_grid(combined, osp.join(out, stem + "_combined" + ext),
                    (-1, 1), grid_size)
    save_image_grid(mask, osp.join(out, "masks.png"), (0, 1), grid_size)
    save_image_grid(real, osp.join(out, "reals.png"), (-1, 1), grid_size)
    save_image_grid(erased, osp.join(out, "erased.png"), (-1, 1), grid_size)


def _check_batch_limits(cfg_model_g, batch_size, n_dev, where):
    """Fail fast on known-bad (resolution, per-chip batch) TPU configs —
    the alternative is a 15-25 min compile ending in an opaque HTTP 500
    (runtime/limits.py table)."""
    from .limits import validate_per_chip_batch
    try:
        syn = (cfg_model_g.get("args") or {}).get("synthesis") or {}
        args = syn.get("args") or {}
        res, ch_base = args.get("resolution"), args.get("ch_base", 0)
    except AttributeError:
        return
    if res and ch_base and ch_base >= 32768:  # full-size channel plan only
        validate_per_chip_batch(res, batch_size // max(n_dev, 1), where)


def _num_workers(cfg_section, n_dev):
    """Host pipeline worker threads from config (the reference's
    dataset_num_workers[_per_gpu], shgan_default.py:193-201); None →
    auto (host core count).  The per-gpu knob scales by the devices THIS
    process drives (like a torch DataLoader per rank), not the global
    mesh size — on multi-host, each host threads for its own chips."""
    w = cfg_section.get("dataset_num_workers")
    if w is None:
        per = cfg_section.get("dataset_num_workers_per_gpu")
        if per is not None:
            w = per * min(n_dev, jax.local_device_count())
    return w


class eval_stage:
    """FID/LPIPS/PSNR/SSIM evaluation of a (pretrained) generator —
    the reference's production path (shgan_default.py:156-303)."""

    def __call__(self, cfg):
        cfgv = cfg["eval"]
        cfge = cfg.get("env", {})
        seed = cfge.get("rnd_seed", 0) or 0
        log_dir = cfgv.get("log_dir") or "log/eval"

        mesh = create_mesh(cfge.get("mesh_devices"))
        n_dev = mesh.devices.size
        batch_size = cfgv.get("batch_size") or (
            cfgv["batch_size_per_gpu"] * n_dev)
        print_log(f"devices: {n_dev}, global eval batch: {batch_size}")
        _check_batch_limits(cfg["model_g"], batch_size, n_dev, "eval_stage")

        if n_dev == 1 and jax.default_backend() == "tpu":
            if cfgv.get("pallas_noise", True):
                # single-chip: hardware-PRNG noise kernel (ops/noise.py)
                from ..ops.noise import set_noise_impl
                set_noise_impl("pallas")
            if cfgv.get("pallas_conv1024", False):
                # opt-in ONLY: the Pallas low-channel kernel wins 1.18x in
                # isolation but loses 0.73x inside the full 1024² model
                # (docs/perf_ab.json record 16; ops/conv1024.py)
                from ..ops.conv1024 import set_conv1024_impl
                set_conv1024_impl("pallas")

        dataset = get_dataset(cfgv["dataset"],
                              fallback_synthetic=cfge.get("debug", False))

        ds_cfg = cfgv["dataset"]
        if (str(ds_cfg.get("type", "")).endswith("loadgen")
                or ds_cfg.get("gen_dir")
                or (ds_cfg.get("args") or {}).get("gen_dir")):
            # no-generator eval of pre-generated images (reference
            # --evalnog_path + *_loadgen datasets, ds_ffhq.py:388-456)
            evaluator = self._build_evaluator(cfgv, cfge)
            rv = self._eval_pregen(dataset, evaluator, batch_size, log_dir,
                                   log_display=cfgv.get("log_display", 10),
                                   num_threads=_num_workers(cfgv, n_dev))
            return {"eval_rv": rv}

        formatter = wrap_formatter(
            get_formatter(cfgv["dataset"]["formatter"]),
            cfgv["dataset"].get("transforms"))
        # 'u8' transport ships batches to the device as uint8 (4× fewer
        # bytes over PCIe/tunnel; bit-identical for uint8-sourced images,
        # see models/infer.py) — the throughput default for device-fed
        # metric stacks; 'f32' remains the parity default.
        # device_image_bank additionally keeps the images resident in HBM
        # (uploaded once) so per-batch host→device traffic is int32 rows
        # + bitpacked masks.
        transport = cfgv.get("transport", "f32")
        use_bank = bool(cfgv.get("device_image_bank", False))
        pipe = EvalPipeline(dataset, formatter, batch_size, mesh=mesh,
                            seed=seed, num_threads=_num_workers(cfgv, n_dev),
                            transport=transport, device_image_bank=use_bank)

        pretrained = cfgv.get("pretrained_pth")
        if (pretrained and not osp.isfile(pretrained)
                and cfge.get("debug", False)):
            print_log(f"debug: pretrained [{pretrained}] missing — "
                      "using random init")
            pretrained = None
        G, params = build_generator(
            cfg["model_g"], pretrained,
            strict=cfgv.get("strict_sd", True), seed=seed)
        params = jax.device_put(params, replicated(mesh))

        if cfgv.get("output_sample_images", False):
            if jax.process_count() > 1:
                # lead-only, on a host copy of the replicated params so the
                # jit stays process-local (no cross-host collectives)
                if is_lead():
                    draw_demo_grid(G, jax.device_get(params), dataset,
                                   formatter, log_dir, G.z_dim)
            else:
                draw_demo_grid(G, params, dataset, formatter, log_dir,
                               G.z_dim)
            if cfgv.get("demo_only", False):
                print_log(f"demo grid written to {log_dir}/demo")
                return {"eval_rv": None}

        evaluator = self._build_evaluator(cfgv, cfge)
        if use_bank and getattr(evaluator, "needs_generator", False):
            raise ValueError(
                "device_image_bank does not support generator-in-the-loop "
                "metrics (PPL) — drop the bank or the metric")

        # eval runs with random noise like the reference
        # (shgan_default.py:260); parity runs pin noise_mode: const/none
        noise_mode = cfgv.get("noise_mode", "random")

        from ..models.infer import composite_forward, z_for_positions

        bank = pipe.device_bank

        @jax.jit
        def run_generator(params, real, mask, z, rng_data):
            """composite + uint8 quantize (shgan_default.py:257-262);
            uint8 on device — 4x less device→host readback."""
            rng = jax.random.wrap_key_data(rng_data)
            return composite_forward(G, params, real, mask, z, rng,
                                     noise_mode=noise_mode)

        @jax.jit
        def expand_bank_batch(idx, pmask):
            """Bank mode: int32 rows → uint8 images from the HBM-resident
            bank; bitpacked masks → uint8 {0,1}.  Its own small jit so the
            generator graph (and its compile cache entry) is unchanged."""
            real = jnp.take(bank, idx, axis=0)
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
            bits = (pmask[..., None] >> shifts) & jnp.uint8(1)
            mask = bits.reshape(pmask.shape[:-1] + (pmask.shape[-1] * 8,))
            return real, mask

        @jax.jit
        def dev_views_f32(fake_u8, real):
            """On-device evaluator inputs (same formulas as the numpy
            hand-off below, same f32 dtype — bitwise-identical values):
            detector 0-255 floats and LPIPS [0,1] pairs.  Feature/LPIPS
            metrics then read device-to-device; only 2048-d features and
            per-image distances cross to the host."""
            f32 = fake_u8.astype(jnp.float32)
            r255 = real * 127.5 + 127.5
            return {"fake_dev": f32, "real_dev": r255,
                    "pred_dev": f32 / 255.0, "gt_dev": (real + 1) / 2}

        def dev_views(fake_u8, real):
            if real.dtype == jnp.uint8:
                # u8 transport: the generator's uint8 output and the
                # uploaded uint8 real ARE the device views — zero extra
                # HBM (detector/LPIPS jits cast uint8 internally; at
                # bs=120/512² the four f32 copies were 1.5 GB per batch)
                return {"fake_dev": fake_u8, "real_dev": real,
                        "pred_dev": fake_u8, "gt_dev": real}
            return dev_views_f32(fake_u8, real)

        def local_z(idx):
            """Per-sample z keyed by global dataset position, so the
            (image, z) pairing is invariant to the process layout; each
            host builds only its own rows and the mesh assembly matches
            the data batch."""
            lbs = pipe.shard.batch_size
            off = pipe.shard.global_offset + idx * lbs
            return z_for_positions(seed, G.z_dim, range(off, off + lbs))

        # every process derives the identical key stream from the shared
        # seed; keys cross into jit as host numpy (implicitly replicated
        # on a multi-host mesh — nothing to broadcast).  The stream lives
        # on the host CPU backend: key split + key_data readback would
        # otherwise cost two accelerator round-trips per batch (the
        # tunnel RTT is material on remoted TPUs).
        from ..parallel import local_batch_to_global
        try:
            _cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            # jax_platforms restricted to the accelerator alone (some jax
            # versions then don't register a cpu backend) — fall back to
            # the default device; two extra RTTs per batch, still correct
            _cpu = None

        def _on_cpu():
            import contextlib
            return (jax.default_device(_cpu) if _cpu is not None
                    else contextlib.nullcontext())

        with _on_cpu():
            key = jax.random.key(seed)
        log_display = cfgv.get("log_display", 10)
        # when every configured metric reads its device view (FID/KID/PR/
        # IS/LPIPS), skip the full-image device→host readback entirely —
        # only 2048-d features / per-image distances ever cross the link.
        # Multi-host included: the detector/LPIPS jits consume the GLOBAL
        # sharded arrays and each process keeps local_rows of the feature
        # output (eval/feature_metrics.py add_batch), so the multi-host
        # eval path now runs the same device-fed code as single-host
        needs_np = getattr(evaluator, "consumes_host_pixels", True)
        # and symmetrically: build the device views only when some metric
        # reads them (with f32 transport they are four full-image f32
        # device copies per batch — ~1.5 GB at 512²/bs=120)
        needs_dev = getattr(evaluator, "consumes_device_views", True)
        batch_s = []
        phase_log = os.environ.get("SHGAN_EVAL_TIMING") == "1"
        t0 = timeit.default_timer()
        t_prev = t0
        it = iter(pipe)
        for idx in range(len(pipe)):
            t_a = timeit.default_timer()
            try:
                real, mask, valid, uids = next(it)
            except StopIteration:
                break
            t_b = timeit.default_timer()
            with _on_cpu():
                key, kn = jax.random.split(key)
            (z,) = local_batch_to_global((local_z(idx),), mesh)
            if bank is not None:
                real, mask = expand_bank_batch(real, mask)
            fake = run_generator(params, real, mask, z,
                                 np.asarray(jax.random.key_data(kn)))
            if phase_log:
                # scalar-readback fence: block_until_ready alone is not a
                # reliable fence on tunneled backends (CLAUDE.md) — the
                # gen/metrics split would misattribute the bottleneck
                np.asarray(fake[(0,) * fake.ndim])
            t_c = timeit.default_timer()
            # hand the evaluators device views so the Inception/LPIPS
            # forwards skip the host round trip (multi-host included:
            # the jits consume the global sharded arrays and evaluators
            # keep local feature rows — see eval/feature_metrics.py)
            dev = dev_views(fake, real) if needs_dev else {}
            if needs_np:
                # local_rows: this process's block of the global batch —
                # the same rows its DataShard formatted (valid/uids too)
                fake_np = local_rows(fake).astype(np.float32)
                real_np = local_rows(real)
                if real_np.dtype == np.uint8:  # u8 transport
                    real255 = real_np.astype(np.float32)
                else:
                    real255 = real_np * 127.5 + 127.5
                host = dict(pred=fake_np / 255.0, gt=real255 / 255.0
                            if real_np.dtype == np.uint8
                            else (real_np + 1) / 2,
                            fake=fake_np, real=real255)
            else:
                host = dict(pred=None, gt=None, fake=None, real=None)
            evaluator.add_batch(
                # masks are consumed only by the generator-in-the-loop
                # metrics (PPL contexts) — skip the per-batch device→host
                # mask readback for everything else
                mask=(local_rows(mask)
                      if getattr(evaluator, "needs_generator", False)
                      else None),
                fn=uids, valid=valid, **host, **dev)
            now = timeit.default_timer()
            if phase_log:
                print_log(f"batch {idx}: pipe_wait {t_b - t_a:.3f}s "
                          f"gen {t_c - t_b:.3f}s "
                          f"metrics {now - t_c:.3f}s")
            batch_s.append(now - t_prev)
            t_prev = now
            if idx % log_display == log_display - 1:
                print_log("processed.. {}, Time:{:.2f}s".format(
                    idx + 1, now - t0))
                t0 = now

        # fence the deferred device work (feature banks dispatch ahead of
        # the host) — timed separately so throughput accounting is honest:
        # the loop above measures dispatch, loop+drain measures work done
        t_loop_end = timeit.default_timer()
        evaluator.drain()
        drain_s = timeit.default_timer() - t_loop_end

        if jax.process_count() > 1:
            # restore global dataset order across hosts before computing
            evaluator.sync_across_processes()
        if getattr(evaluator, "needs_generator", False):
            # generator-in-the-loop metrics (PPL) run after the stream
            evaluator.run_generator_metrics(G, params, seed=seed)
        evaluator.set_sample_n(len(dataset))
        rv = evaluator.compute()
        evaluator.one_line_summary()
        if is_lead():
            evaluator.save(log_dir)
        evaluator.clear_data()
        # per-batch wall times (batch 0 carries the jit compiles) — the
        # e2e throughput bench reads these (bench.py BENCH_E2E)
        timing = {"batch_s": batch_s, "drain_s": drain_s,
                  "global_batch": batch_size, "images": len(dataset)}
        return {"eval_rv": rv, "timing": timing}

    @staticmethod
    def _build_evaluator(cfgv, cfge):
        try:
            return get_evaluator(cfgv["evaluator"])
        except FileNotFoundError as e:
            if not cfge.get("debug", False):
                raise
            # debug smoke: metrics that need external detector weights
            # degrade to the weight-free ones
            print_log(f"debug: evaluator asset missing ({e}); "
                      "falling back to [psnr, ssim]")
            return get_evaluator([{"type": "psnr"}, {"type": "ssim"}])

    @staticmethod
    def _eval_pregen(dataset, evaluator, batch_size, log_dir,
                     log_display=10, num_threads=None):
        """Metrics over (real, pre-generated) pairs, no generator in the
        loop — the reference's loadgen/--evalnog protocol.  Batches decode
        on the prefetch pool (two PNG decodes per element)."""
        from ..data.pipeline import _Prefetcher
        t0 = timeit.default_timer()
        n = len(dataset)
        n_batches = -(-n // batch_size)
        # multi-process: contiguous block of batches per process (order-
        # preserving under the evaluator allgather), lead-only save below
        pid, pcount = jax.process_index(), jax.process_count()
        per = -(-n_batches // pcount)
        my_batches = list(range(pid * per, min((pid + 1) * per, n_batches)))
        # a process with NO batches must still participate in the gather
        # collectives (sync pairs by non-empty banks across processes):
        # re-score batch 0 fully masked out — zero rows contributed, the
        # collective pairing stays alive
        dummy = pcount > 1 and not my_batches
        if dummy:
            my_batches = [0]

        def make_batch(j):
            b = my_batches[j]
            els = [dataset[i] for i in range(b * batch_size,
                                             min((b + 1) * batch_size, n))]
            real = np.stack([e["image"] for e in els])       # [N,3,H,W] 0-1
            gen = np.stack([e["gen"] for e in els])
            uids = [e["unique_id"] for e in els]
            return real, gen, uids

        pf = _Prefetcher(make_batch, len(my_batches),
                         num_threads=num_threads)
        for idx, (real, gen, uids) in enumerate(pf):
            evaluator.add_batch(
                pred=gen, gt=real,
                fake=gen * 255.0, real=real * 255.0,
                fn=uids,
                valid=np.zeros(len(uids), bool) if dummy else None)
            if idx % log_display == log_display - 1:
                print_log("processed.. {}, Time:{:.2f}s".format(
                    idx + 1, timeit.default_timer() - t0))
                t0 = timeit.default_timer()
        if pcount > 1:
            evaluator.sync_across_processes()
        evaluator.set_sample_n(n)
        rv = evaluator.compute()
        if is_lead():
            evaluator.one_line_summary()
            evaluator.save(log_dir)  # result.json read-modify-write:
            # concurrent multi-process writes would drop merged keys
        evaluator.clear_data()
        return rv


class train_stage:
    """The working StyleGAN2/CoModGAN training loop (the reference's is
    partially dead, stylegan_default.py:93-581; spec preserved)."""

    def __call__(self, cfg):
        from ..train import (TrainConfig, init_train_state, make_train_step,
                             compute_ema_beta)
        cfgt = cfg["train"]
        cfge = cfg.get("env", {})
        seed = cfge.get("rnd_seed", 0) or 0
        log_dir = cfgt.get("log_dir") or "log/train"

        mesh = create_mesh(cfge.get("mesh_devices"))
        n_dev = mesh.devices.size
        batch_size = cfgt.get("batch_size") or (
            cfgt["batch_size_per_gpu"] * n_dev)
        _check_batch_limits(cfg["model_g"], batch_size, n_dev, "train_stage")

        dataset = get_dataset(cfgt["dataset"],
                              fallback_synthetic=cfge.get("debug", False))
        formatter = wrap_formatter(
            get_formatter(cfgt["dataset"]["formatter"]),
            cfgt["dataset"].get("transforms"))
        pipe = TrainPipeline(dataset, formatter, batch_size, mesh=mesh,
                             seed=seed, num_threads=_num_workers(cfgt, n_dev))

        cfg_g, cfg_d = cfg["model_g"], cfg["model_d"]
        if cfgt.get("remat", False):
            # opt-in per-block rematerialization for memory-bound configs.
            # Measured on v5e: saves activation HBM on the main phases but
            # slows them ~25%, and interacts badly with the double-backprop
            # regularization phases — prefer smaller per-chip batch first.
            cfg_g, cfg_d = copy.deepcopy(cfg_g), copy.deepcopy(cfg_d)
            for sub in ("encoder", "synthesis"):
                sub_cfg = (cfg_g.get("args") or {}).get(sub)
                if isinstance(sub_cfg, dict):
                    sub_cfg.setdefault("args", {})["remat"] = True
            cfg_d.setdefault("args", {})["remat"] = True
        G = get_model(cfg_g)
        D = get_model(cfg_d)
        tc = TrainConfig(**(cfgt.get("loss_kwargs") or {}))
        state = init_train_state(G, D, jax.random.key(seed), tc)
        state = jax.device_put(state, replicated(mesh))
        step_fn = jax.jit(make_train_step(G, D, tc),
                          static_argnames=("do_greg", "do_dreg"),
                          donate_argnums=(0,))

        # writer-process-only stats files (reference RANK==0 convention)
        logger = ScalarLogger(log_dir if is_lead() else None,
                              tensorboard=cfgt.get("log_tensorboard", False))
        total_kimg = cfgt.get("total_kimg", 25000)
        kimg_per_tick = cfgt.get("kimg_per_tick", 4)
        snapshot_ticks = cfgt.get("snapshot_ticks", 50)
        # per-tick image grids of G_ema (the reference's fakes{kimg}.png
        # train-time snapshots, stylegan_default.py:402-534); 0/None
        # disables
        image_ticks = cfgt.get("image_snapshot_ticks", snapshot_ticks)
        cur_nimg, cur_tick, tick_start = 0, 0, 0

        resume_path = cfgt.get("resume_path")
        if resume_path:
            from ..checkpoint.orbax_io import load_checkpoint
            state = load_checkpoint(resume_path, state)
            state = jax.device_put(state, replicated(mesh))
            # replica consistency after host-side surgery (the reference's
            # dead DDP hash-compare, stylegan_default.py:189-190)
            from ..parallel import check_replicated
            check_replicated(state["params_g"])
            check_replicated(state["params_d"])
            # resume_itern is in KIMG (it names the network-snapshot-*
            # picked by load_resume_run, reference --resume_itern
            # semantics); without it, progress comes from the restored
            # step counter
            if cfgt.get("resume_itern") is not None:
                cur_nimg = int(cfgt["resume_itern"]) * 1000
            else:
                cur_nimg = int(state["step"]) * batch_size
            tick_start = cur_nimg
            print_log(f"resumed from {resume_path} at {cur_nimg/1e3:.1f} "
                      "kimg")

        # jax.profiler trace of a few steady-state steps (the reference's
        # per-phase CUDA-event timing, stylegan_default.py:321-326, becomes
        # an XLA trace viewable in TensorBoard/xprof)
        profile_dir = (cfgt.get("profile_dir")
                       or os.environ.get("SHGAN_PROFILE_DIR"))
        profile_at = 8 if profile_dir else -1

        # nested eval-in-train + best-checkpoint tracking (the reference's
        # generic trainer, utils.py:39-221: periodic eval, is_better compare,
        # '-best' save)
        eval_every = cfgt.get("eval_every_kimg")
        nested_eval = None
        if eval_every and cfg.get("eval"):
            nested_eval = self._make_nested_eval(cfg, cfge, G, mesh)
        best_metric = None
        # rebase past the resumed progress: the next multiple of the eval
        # interval STRICTLY above cur_nimg (otherwise a resume at N kimg
        # would run a full nested eval on every tick until the counter
        # caught up)
        next_eval = None
        if eval_every:
            step_n = eval_every * 1000
            next_eval = (cur_nimg // step_n + 1) * step_n

        if image_ticks:
            # initial grid: reals/masks/erased + the untrained (or
            # resumed) G_ema output — the reference's fakes_init.png
            self.draw_train_grid(G, state, dataset, formatter, log_dir,
                                 "fakes_init.png")

        key = jax.random.key(seed + 1)
        it = iter(pipe)
        import time as _time
        t_tick = _time.time()
        step_count = 0
        pending = []  # device-side metric dicts; read back once per tick
        while cur_nimg < total_kimg * 1000:
            real, mask = next(it)
            step_i = int(cur_nimg // batch_size)
            key, k = jax.random.split(key)
            beta = compute_ema_beta(tc, batch_size, cur_nimg)
            if step_count == profile_at:
                jax.profiler.start_trace(profile_dir)
            state, metrics = step_fn(
                state, (real, mask), k, jnp.float32(beta),
                do_greg=(step_i % tc.g_reg_interval == 0),
                do_dreg=(step_i % tc.d_reg_interval == 0))
            if step_count == profile_at + 2 and profile_at >= 0:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                print_log(f"wrote profiler trace to {profile_dir}")
            # keep metrics on device: a float() here would force a blocking
            # host readback every step
            pending.append(metrics)
            step_count += 1
            cur_nimg += batch_size
            if cur_nimg >= tick_start + kimg_per_tick * 1000 \
                    or cur_nimg >= total_kimg * 1000:
                for m in jax.device_get(pending):
                    logger.accumulate({k2: float(v) for k2, v in m.items()})
                pending.clear()
                means = logger.flush(cur_nimg)
                dt = _time.time() - t_tick
                t_tick = _time.time()
                print_log(
                    "tick {:<5d} kimg {:<8.1f} sec/kimg {:<7.2f} "
                    "loss_g {:.3f} loss_d {:.3f}".format(
                        cur_tick, cur_nimg / 1e3,
                        dt / max(cur_nimg - tick_start, 1) * 1e3,
                        means.get("loss_g", float("nan")),
                        means.get("loss_d", float("nan"))))
                tick_start = cur_nimg
                cur_tick += 1
                if nested_eval is not None and cur_nimg >= next_eval:
                    # jump to the next interval ABOVE the current counter
                    # (a big tick may cross several intervals — run one
                    # eval, not one per crossed interval)
                    next_eval = (cur_nimg // (eval_every * 1000) + 1) \
                        * (eval_every * 1000)
                    name, value, higher_better = nested_eval(
                        state["params_gema"])
                    logger.accumulate({f"eval_{name}": value})
                    print_log(f"nested eval @ {cur_nimg/1e3:.1f} kimg: "
                              f"{name}={value:.4f}")
                    improved = best_metric is None or (
                        value != best_metric
                        and (value > best_metric) == higher_better)
                    if improved:
                        best_metric = value
                        self.save_snapshot(state, log_dir, cur_nimg,
                                           tag="best")
                        print_log(f"new best {name}={value:.4f}")
                if cur_tick % snapshot_ticks == 0:
                    self.save_snapshot(state, log_dir, cur_nimg)
                if image_ticks and cur_tick % image_ticks == 0:
                    self.draw_train_grid(
                        G, state, dataset, formatter, log_dir,
                        "fakes{:06d}.png".format(cur_nimg // 1000))
        logger.close()
        self.save_snapshot(state, log_dir, cur_nimg)
        if image_ticks:
            self.draw_train_grid(G, state, dataset, formatter, log_dir,
                                 "fakes{:06d}.png".format(cur_nimg // 1000))
        return {"state": state}

    @staticmethod
    def draw_train_grid(G, state, dataset, formatter, log_dir, filename):
        """Lead-only G_ema demo grid during training (the reference writes
        fakes{kimg}.png per image-snapshot tick, stylegan_default.py:
        402-534).  The jitted demo forward is memoized on ``G``, so only
        the first call compiles."""
        if not is_lead():
            return
        params = state["params_gema"]
        if jax.process_count() > 1:
            # host copy keeps the demo jit process-local (no collectives)
            params = jax.device_get(params)
        draw_demo_grid(G, params, dataset, formatter, log_dir, G.z_dim,
                       subfolder="demo", filename=filename)

    @staticmethod
    def save_snapshot(state, log_dir, cur_nimg, tag=None):
        from ..checkpoint.orbax_io import save_checkpoint
        name = ("network-snapshot-{}".format(tag) if tag else
                "network-snapshot-{:06d}".format(cur_nimg // 1000))
        path = osp.join(log_dir, "weight", name)
        # EVERY process enters the save: orbax runs cross-process barriers
        # whenever process_count > 1, so a lead-only call would leave the
        # lead blocked at a barrier the others never reach.  Orbax is
        # multihost-aware — the replicated global arrays are written once
        # (primary host), matching the reference's RANK==0 convention.
        save_checkpoint(path, state)
        if is_lead():
            print_log(f"saved snapshot {path}")

    @staticmethod
    def _make_nested_eval(cfg, cfge, G, mesh):
        """Build a G_ema → (metric_name, value, higher_better) functor over
        a small eval subset — the in-train eval of the reference's generic
        trainer (utils.py:39-221) plus the metric suite the reference's
        train tick runs (stylegan_default.py:402-534).  Supports the
        weight-free per-batch metrics (psnr/ssim) and detector-backed
        ``fid`` (with the cached-real-features protocol over the fixed
        nested subset); fid degrades to psnr when detector weights are
        absent so asset-free smoke runs keep training."""
        cfgv = copy.deepcopy(cfg["eval"])
        samples = cfgv.get("nested_eval_samples", 64)
        if cfgv.get("dataset") is not None:
            cfgv["dataset"]["try_sample"] = samples
        dataset = get_dataset(cfgv["dataset"],
                              fallback_synthetic=cfge.get("debug", False))
        formatter = wrap_formatter(
            get_formatter(cfgv["dataset"]["formatter"]),
            cfgv["dataset"].get("transforms"))
        batch_size = cfgv.get("batch_size") or (
            cfgv.get("batch_size_per_gpu", 4) * mesh.devices.size)
        pipe = EvalPipeline(dataset, formatter, batch_size, mesh=mesh)
        metric = cfgv.get("nested_eval_metric", "psnr")
        # scalar metrics only: 'is'/'pr' return dicts and PPL needs the
        # generator in the loop — fail at build time, not at the first
        # eval tick after a multi-minute compile
        supported = ("psnr", "ssim", "fid")
        if metric not in supported:
            raise ValueError(
                f"nested_eval_metric [{metric}] unsupported — the in-train"
                f" nested eval runs scalar metrics only "
                f"{supported}; run the full evaluator compose via the eval"
                " stage instead")
        fid_args = None
        if metric == "fid":
            # detector config from the eval stack's own fid entry (weights
            # path / injected params / resize policy), with a run-local
            # real-feature cache: the nested subset is FIXED, so real
            # features are computed once at the first eval tick and read
            # from <log_dir>/.cache afterwards (eva_fid.py:177-187
            # protocol)
            fid_args = {}
            for e in cfgv.get("evaluator") or []:
                if isinstance(e, dict) and e.get("type") == "fid":
                    fid_args = dict(e.get("args") or {})
            fid_args["sample_real_n"] = None
            fid_args["sample_fake_n"] = None
            fid_args["dsstat_cachefile_tag"] = f"nested{samples}"
            fid_args["cache_dir"] = osp.join(
                cfg["train"].get("log_dir") or "log/train", ".cache")
            try:
                get_evaluator([{"type": "fid", "args": fid_args}])
            except FileNotFoundError as e:
                print_log(f"nested eval: fid detector unavailable ({e}) — "
                          "falling back to psnr")
                metric, fid_args = "psnr", None
        higher_better = metric != "fid"  # psnr/ssim up, fid down
        seed = cfge.get("rnd_seed", 0) or 0

        @jax.jit
        def fwd(params, real, mask, z, rng_data):
            rng = jax.random.wrap_key_data(rng_data)
            x = jnp.concatenate([mask - 0.5, real * mask], axis=1)
            img = G(params, x, z, noise_mode="random", rng=rng)
            combined = real * mask + img * (1 - mask)
            return jnp.clip(combined * 127.5 + 127.5, 0, 255)

        def run(params_gema):
            if fid_args is not None:
                evaluator = get_evaluator([{"type": "fid",
                                            "args": fid_args}])
            else:
                evaluator = get_evaluator([{"type": metric}])
            key = jax.random.key(seed + 12345)
            for real, mask, valid, uids in pipe:
                key, kz, kn = jax.random.split(key, 3)
                z = np.asarray(jax.random.normal(kz,
                                                 (real.shape[0], G.z_dim)))
                fake = local_rows(fwd(params_gema, real, mask, z,
                                      np.asarray(jax.random.key_data(kn))))
                if fid_args is not None:
                    # the scored image is uint8-quantized in the protocol
                    # (shgan_default.py:257-262)
                    fake = np.rint(fake)
                real_np = local_rows(real)
                evaluator.add_batch(pred=fake / 255.0,
                                    gt=(real_np + 1) / 2,
                                    fake=fake, real=real_np * 127.5 + 127.5,
                                    fn=uids, valid=valid)
            if jax.process_count() > 1:
                evaluator.sync_across_processes()
            evaluator.set_sample_n(len(dataset))
            rv = evaluator.compute()
            evaluator.clear_data()
            value = float(rv[metric] if isinstance(rv, dict) else rv)
            return metric, value, higher_better

        return run
