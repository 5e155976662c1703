"""HBM accounting of the flagship 512² forward (VERDICT r2 weak #3: the
batch ceiling).  AOT-compiles the exact bench.py forward at a given batch
size and prints the executable's XLA memory analysis — peak, temporaries,
arguments, output — without running it, so batch/layout/donation levers
can be compared at compile cost only (and the persistent compile cache
makes repeats free).

Usage: python tools/mem_512.py [--bs 120] [--res 512] [--fp32]
       [--donate] [--u8]
  --donate  donate the real/mask input buffers (the eval stage feeds
            fresh batches, so their HBM is reusable for temporaries)
  --u8      uint8 real + bool mask inputs (the device_image_bank/u8
            transport shapes the eval stage actually feeds)
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=120)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--donate", action="store_true")
    ap.add_argument("--u8", action="store_true")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from shgan_tpu.runtime.config import model_cfg_bank
    from shgan_tpu.models import get_model
    from shgan_tpu.models.infer import composite_forward

    cfg = model_cfg_bank()(f"shgan_g{a.res}")
    if not a.fp32:
        cfg["args"]["encoder"]["args"]["use_fp16_before_res"] = 16
        cfg["args"]["synthesis"]["args"]["use_fp16_after_res"] = 16
    G = get_model(cfg)
    params = G.init(jax.random.key(0))

    def forward(params, real, mask, z, key):
        return composite_forward(G, params, real, mask, z, key,
                                 noise_mode="random")

    bs, res = a.bs, a.res
    if a.u8:
        real = jnp.zeros((bs, 3, res, res), jnp.uint8)
        mask = jnp.zeros((bs, 1, res, res), jnp.uint8)
    else:
        real = jnp.zeros((bs, 3, res, res), jnp.float32)
        mask = jnp.zeros((bs, 1, res, res), jnp.float32)
    z = jnp.zeros((bs, G.z_dim), jnp.float32)
    key = jax.random.key(1)

    jit_kw = dict(donate_argnums=(1, 2)) if a.donate else {}
    try:
        lowered = jax.jit(forward, **jit_kw).lower(params, real, mask, z,
                                                   key)
        compiled = lowered.compile()
    except Exception as e:
        print(f"COMPILE FAILED bs={bs}: {type(e).__name__}: {str(e)[:400]}")
        return 1
    try:
        ma = compiled.memory_analysis()
        if isinstance(ma, list):
            ma = ma[0]
        gb = 1 / 1e9
        print(f"bs={bs} res={res} fp32={a.fp32} donate={a.donate} "
              f"u8={a.u8}")
        for name in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes", "alias_size_in_bytes",
                     "generated_code_size_in_bytes"):
            v = getattr(ma, name, None)
            if v is not None:
                print(f"  {name:28s}: {v*gb:8.3f} GB")
        tot = (getattr(ma, "temp_size_in_bytes", 0)
               + getattr(ma, "argument_size_in_bytes", 0)
               + getattr(ma, "output_size_in_bytes", 0)
               - getattr(ma, "alias_size_in_bytes", 0))
        print(f"  {'total (args+temp+out-alias)':28s}: {tot*gb:8.3f} GB")
    except Exception as e:
        print(f"memory_analysis unavailable: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
