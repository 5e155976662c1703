"""Export a training snapshot (or any params tree) to a torch ``.pth``.

Bridges snapshots produced by the train stage (Orbax
``network-snapshot-*`` dirs, or the reference's pickle snapshots) to the
``.pth`` state_dict files the reference PyTorch eval consumes
(`/root/reference/lib/experiments/shgan_default.py:221-226`).

    python tools/export_pth.py --snapshot log/.../weight/network-snapshot-best \
        --out shgan_ffhq256_ours.pth [--key params_gema]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snapshot", required=True,
                   help="Orbax snapshot dir or reference .pkl snapshot")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--key", default="params_gema",
                   help="state subtree to export (params_gema / params_g / "
                        "params_d; G_ema / G / D for .pkl snapshots)")
    args = p.parse_args()

    from shgan_tpu.checkpoint import save_torch_pth

    if args.snapshot.endswith(".pkl"):
        from shgan_tpu.checkpoint import (load_network_snapshot,
                                          torch_state_dict_to_params)
        data, is_tf = load_network_snapshot(args.snapshot)
        if is_tf:
            raise SystemExit("legacy TF pickles are load-only (no remap)")
        key = {"params_gema": "G_ema", "params_g": "G",
               "params_d": "D"}.get(args.key, args.key)
        params = torch_state_dict_to_params(data[key])
    else:
        from shgan_tpu.checkpoint.orbax_io import load_checkpoint
        state = load_checkpoint(args.snapshot)
        if args.key not in state:
            raise SystemExit(
                f"--key {args.key!r} not in snapshot; available: "
                f"{sorted(state)}")
        params = state[args.key]

    save_torch_pth(args.out, params)
    n = len(params)
    print(f"wrote {args.out} ({n} top-level entries from {args.key})")


if __name__ == "__main__":
    main()
