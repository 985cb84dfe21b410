"""Bilinear resize with exact torch ``F.interpolate(align_corners=False)``
semantics, including DOWNsampling.

``jax.image.resize(method='linear')`` antialiases when scaling down, but
torch's bilinear does not — it point-samples with a 2-tap kernel.  The loss
downsamples gt masks (``multibox_loss.py:518-523, 225-228``) with torch
semantics, and mAP parity depends on it.  A non-antialiased separable
bilinear resize is exactly two matmuls with precomputed 2-banded weight
matrices — dense on the MXU, cheap, and static per (in, out) pair.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] interpolation matrix, torch half-pixel sampling with the
    source coordinate clamped at 0 (ATen upsample_bilinear2d)."""
    scale = in_size / out_size
    w = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        src = max((i + 0.5) * scale - 0.5, 0.0)
        x0 = int(np.floor(src))
        x0 = min(x0, in_size - 1)
        x1 = min(x0 + 1, in_size - 1)
        lam = src - x0
        w[i, x0] += 1.0 - lam
        w[i, x1] += lam
    return w


def resize_bilinear_torch(x: jnp.ndarray, size) -> jnp.ndarray:
    """Resize the trailing two spatial dims of [..., H, W] to `size`,
    matching torch bilinear align_corners=False exactly (no antialias)."""
    h_out, w_out = size
    h_in, w_in = x.shape[-2], x.shape[-1]
    if (h_in, w_in) == (h_out, w_out):
        return x
    wh = jnp.asarray(_weights(h_in, h_out))   # [h_out, h_in]
    ww = jnp.asarray(_weights(w_in, w_out))   # [w_out, w_in]
    x = jnp.einsum('oh,...hw->...ow', wh, x,
                   preferred_element_type=jnp.float32)
    x = jnp.einsum('pw,...hw->...hp', ww, x,
                   preferred_element_type=jnp.float32)
    return x


def resize_bilinear_torch_np(x: np.ndarray, size) -> np.ndarray:
    """Numpy twin of :func:`resize_bilinear_torch` for host-side code
    (same precomputed 2-banded matrices; BLAS matmuls)."""
    h_out, w_out = size
    h_in, w_in = x.shape[-2], x.shape[-1]
    if (h_in, w_in) == (h_out, w_out):
        return np.asarray(x, np.float32)
    wh = _weights(h_in, h_out)
    ww = _weights(w_in, w_out)
    x = np.einsum('oh,...hw->...ow', wh, np.asarray(x, np.float32))
    return np.einsum('pw,...hw->...hp', ww, x)
