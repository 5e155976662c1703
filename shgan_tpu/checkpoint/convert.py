"""Convert reference torch state_dicts ↔ shgan_tpu parameter pytrees.

Our parameter trees intentionally mirror the reference torch ``state_dict``
naming (`/root/reference/lib/experiments/shgan_default.py:221-226` loads
``.pth`` files saved via ``save_state_dict``, `get_model.py:24-29`), so the
conversion is a mechanical unflatten: ``"encoder.b64.conv0.weight"`` →
``params['encoder']['b64']['conv0']['weight']``.

The only special cases:
  * ``resample_filter`` buffers are trace-time constants in our modules
    (baked from ``setup_filter``), so they are dropped (optionally verified).
  * torch convolution weights are OIHW and dense weights [out, in] — exactly
    the layouts our ops consume, so no transposition is needed anywhere.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# expected value of every resample_filter buffer in released checkpoints:
# setup_filter([1, 3, 3, 1]) (stylegan.py:209,453,636)
_EXPECTED_FILTER = (np.outer([1, 3, 3, 1], [1, 3, 3, 1])
                    / np.outer([1, 3, 3, 1], [1, 3, 3, 1]).sum())


def torch_state_dict_to_params(state_dict, verify_filters=True,
                               dtype=jnp.float32):
    """state_dict: flat {name: array-like} → nested params dict."""
    params = {}
    for name, value in state_dict.items():
        v = np.asarray(value)
        parts = name.split(".")
        if parts[-1] == "resample_filter":
            if verify_filters and v.shape == (4, 4):
                np.testing.assert_allclose(v, _EXPECTED_FILTER, atol=1e-6)
            continue
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v, dtype=dtype)
    return params


def params_to_flat_state_dict(params, prefix=""):
    """Inverse: nested params → flat {torch-style name: numpy array}."""
    out = {}
    for k, v in params.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(params_to_flat_state_dict(v, prefix=name + "."))
        else:
            out[name] = np.asarray(v)
    return out
