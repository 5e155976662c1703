"""Batch-generate inpainted images for an experiment's eval dataset.

The producer side of the reference's ``--evalnog_path`` / ``*_loadgen``
protocol (`/root/reference/lib/cfg_helper.py:317,394-397`,
`ds_ffhq.py:388-456`): the reference can *score* a directory of
pre-generated images but ships nothing that creates one.  This tool runs
the experiment's eval set through the compiled serving engine
(`shgan_tpu/serve.py`) and writes ``<uid>.png`` composites.

    python tools/generate.py --experiment shgan_ffhq256_eval \
        --pretrained pretrained/shgan_ffhq256.pth --out gen/
    # then score, generator-free:
    python main.py --experiment shgan_ffhq256_eval --eval 1 --evalnog_path gen/

Masks come from the same deterministic per-position RNG stream as a
direct metric run, so both paths score the same distribution.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--pretrained", type=str, default=None)
    p.add_argument("--batch", type=int, default=None,
                   help="compiled engine batch (default: experiment's)")
    p.add_argument("--n", type=int, default=None,
                   help="only the first N dataset entries")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--bf16", action="store_true",
                   help="serve blocks >16² in bfloat16")
    p.add_argument("--debug", action="store_true",
                   help="tiny batch + synthetic-data fallback")
    args = p.parse_args()

    import os
    import jax
    # persistent compile cache: serving-engine compiles through the
    # remote helper are multi-minute, ~30 ms cached (CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    from shgan_tpu.runtime.config import (experiment_cfg_bank,
                                          apply_debug_shrink)
    from shgan_tpu.runtime.logging import print_log
    from shgan_tpu.data import get_dataset
    from shgan_tpu.data.formatters import get_formatter
    from shgan_tpu.data.transforms import wrap_formatter
    from shgan_tpu.serve import InpaintEngine, generate_to_dir

    cfg = experiment_cfg_bank()(args.experiment)
    if args.debug:
        cfg = apply_debug_shrink(cfg)
    cfgv = cfg["eval"]
    cfge = cfg.get("env", {})
    seed = args.seed if args.seed is not None else (
        cfge.get("rnd_seed", 0) or 0)
    if args.n is not None:
        cfgv["dataset"]["try_sample"] = args.n
    batch = args.batch or cfgv.get("batch_size") or \
        cfgv.get("batch_size_per_gpu", 8)
    pretrained = args.pretrained or cfgv.get("pretrained_pth")
    if pretrained and not osp.isfile(pretrained):
        if not args.debug:
            raise FileNotFoundError(pretrained)
        print_log(f"debug: pretrained [{pretrained}] missing — random init")
        pretrained = None

    dataset = get_dataset(cfgv["dataset"], fallback_synthetic=args.debug)
    formatter = wrap_formatter(get_formatter(cfgv["dataset"]["formatter"]),
                               cfgv["dataset"].get("transforms"))
    engine = InpaintEngine(cfg["model_g"], pretrained, batch_size=batch,
                           bf16=args.bf16, seed=seed,
                           strict=cfgv.get("strict_sd", True))
    n = generate_to_dir(engine, dataset, formatter, args.out,
                        log=print_log)
    print_log(f"wrote {n} images to {args.out}")


if __name__ == "__main__":
    main()
