"""Host data-path throughput bench (no device in the loop).

Measures images/sec through DataShard → parallel prefetcher with the real
formatter stack (freeform masks: C++ rasterizer or the bit-identical numpy
recipe), at several worker counts.  The headline device rate (bench.py) is
realizable end-to-end only if this number exceeds it — the reference feeds
GPUs with DataLoader worker processes (`shgan_default.py:193-201`); this is
the TPU-host counterpart to beat.

    python tools/bench_loader.py [--res 512] [--batch 32] [--batches 12]
                                 [--threads 0 1 4 8] [--impl auto|numpy]
                                 [--dataset synthetic|<name>] [--root DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import timeit

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(res, batch, batches, threads, impl, dataset_name, root):
    from shgan_tpu.data.datasets import get_dataset
    from shgan_tpu.data.formatters import get_formatter
    from shgan_tpu.data.sampler import DataShard
    from shgan_tpu.data.pipeline import _Prefetcher

    n = batch * batches
    if dataset_name == "synthetic":
        ds = get_dataset({"type": "synthetic",
                          "args": {"length": n, "resolution": res}})
    else:
        ds = get_dataset({"type": dataset_name,
                          "args": {"root_dir": root, "try_sample": n}})
    fmt = get_formatter({"type": "RandomMaskFormatter",
                         "args": {"mask_resolution": res, "impl": impl}})
    shard = DataShard(ds, fmt, batch, shuffle=False, seed=0)
    nb = min(batches, len(shard))
    # warm one batch (imports, native build, PIL init)
    shard.get_batch(0)
    t0 = timeit.default_timer()
    count = 0
    for real, mask, valid, _ in _Prefetcher(shard.get_batch, nb,
                                            num_threads=threads):
        count += real.shape[0]
    dt = timeit.default_timer() - t0
    return count / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--threads", type=int, nargs="+", default=[0, 1, 4])
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--root", default=None)
    args = ap.parse_args()

    out = {}
    for t in args.threads:
        rate = run_one(args.res, args.batch, args.batches, t, args.impl,
                       args.dataset, args.root)
        out[f"threads_{t}"] = round(rate, 2)
        print(f"# host loader {args.res}²  threads={t}: {rate:.1f} img/s",
              file=sys.stderr)
    print(json.dumps({"metric": f"host loader {args.res}x{args.res} img/s",
                      "impl": args.impl, "dataset": args.dataset,
                      "batch": args.batch, **out}))


if __name__ == "__main__":
    main()
