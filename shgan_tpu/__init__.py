"""shgan_tpu — a TPU-native (JAX/XLA/Pallas) image-completion framework.

A from-scratch rebuild of the capabilities of SHI-Labs/SH-GAN
("Image Completion with Heterogeneously Filtered Spectral Hints", WACV'23):
CoModGAN (StyleGAN2-based co-modulated inpainting GAN) plus the Spectral
Hint Unit (SHU), with data pipeline, evaluators (FID/LPIPS/PSNR/SSIM),
config system, and a working training loop — all designed TPU-first:

  * compute path: jax.numpy / lax / Pallas kernels (MXU-friendly convs,
    fused FIR resampling, einsum co-modulation — no per-sample grouped
    conv weight materialization)
  * parallelism: SPMD over a jax.sharding.Mesh (data parallel over ICI),
    not process-per-device NCCL
  * runtime: single-controller, jit-compiled stages, Orbax checkpoints
    plus a torch-free .pth reader for the reference's released weights.

Reference behaviors are cited inline as `/root/reference/<file>:<line>`.
"""

__version__ = "0.1.0"

_TOP_LEVEL = {
    "get_model": ("shgan_tpu.models", "get_model"),
    "get_dataset": ("shgan_tpu.data", "get_dataset"),
    "get_evaluator": ("shgan_tpu.eval", "get_evaluator"),
    "InpaintEngine": ("shgan_tpu.serve", "InpaintEngine"),
    "generate_to_dir": ("shgan_tpu.serve", "generate_to_dir"),
}


def __getattr__(name):
    """Lazy top-level API (keeps ``import shgan_tpu`` free of jax init)."""
    try:
        mod, attr = _TOP_LEVEL[name]
    except KeyError:
        raise AttributeError(name) from None
    import importlib
    return getattr(importlib.import_module(mod), attr)
