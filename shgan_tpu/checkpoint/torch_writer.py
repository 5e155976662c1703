"""Export params as a torch ``.pth`` state_dict file.

The inverse of :mod:`.torch_reader`: lets a model trained in this
framework be handed back to the reference PyTorch implementation (its
eval stage loads exactly such files, `/root/reference/lib/experiments/
shgan_default.py:221-226`, via ``load_state_dict``/``save_state_dict`` at
`get_model.py:10-29`).

Uses ``torch.save`` when torch is importable (the produced file is a
standard torch zip checkpoint, loadable by any torch version >=1.6);
there is no torch-free writer — the reader side (`torch_reader.py`) is
torch-free because *loading* reference checkpoints must not require
torch, but a file we *write* for torch consumers is pointless without
torch somewhere in the pipeline anyway.
"""

from __future__ import annotations

import numpy as np

from .convert import params_to_flat_state_dict


def save_torch_pth(path, params):
    """Write nested JAX ``params`` (or an already-flat
    ``{torch-name: array}`` dict) to a torch ``.pth`` state_dict file."""
    try:
        import torch
    except ImportError as e:
        raise ImportError(
            "exporting .pth requires torch (the torch-free side of this "
            "framework only reads checkpoints)") from e
    flat = params
    if any(isinstance(v, dict) for v in flat.values()):
        flat = params_to_flat_state_dict(params)
    # np.array(..., order="C") rather than ascontiguousarray: the latter
    # silently promotes 0-d arrays (noise_strength, w_avg-adjacent scalars)
    # to shape (1,), which then fails strict shape checks on load
    sd = {k: torch.from_numpy(np.array(np.asarray(v), order="C"))
          for k, v in flat.items()}
    torch.save(sd, path)
    return path
