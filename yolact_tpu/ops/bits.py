"""Bit-packed binary-mask transport.

Ground-truth instance masks are 0/1 uint8 arrays padded to fixed shapes
([B, max_gt, S, S] for training — 242 MB/batch at b8@550, max_gt=100).
Shipping them host->device byte-per-pixel makes the input pipeline
transfer-bound, so the host packs 8 pixels/byte along the last axis
(np.packbits, MSB-first) and the device unpacks with a shift-and-mask —
an 8x transfer cut for ~one fused elementwise op on chip.

The same encoding is used by the eval-side device mask-IoU path
(eval/device_metrics.py:gt_to_canvas_packed).  The reference has no
equivalent; it ships full masks to the GPU per image (train.py:399-437).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def packed_width(size: int) -> int:
    return -(-size // 8)


def pack_bits_last(masks: np.ndarray) -> np.ndarray:
    """Host: pack a binary array's last axis, 8 pixels/byte (MSB first)."""
    return np.packbits(np.asarray(masks) > 0, axis=-1)


def unpack_bits_last(packed: jnp.ndarray, size: int) -> jnp.ndarray:
    """Device: invert :func:`pack_bits_last` back to uint8 0/1.

    packed [..., ceil(size/8)] uint8 -> [..., size] uint8.
    """
    shifts = 7 - jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)[..., :size]
