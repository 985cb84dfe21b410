"""Device-side mask upsampling + mask IoU for the mAP evaluation loop.

The reference's eval hot path upsamples every predicted mask to the original
image size with torch bilinear and computes mask IoU as a GPU matmul
(``output_utils.py:91-94``, ``eval.py:376-384``).  The straightforward host
port (cv2 resize per mask + numpy matmul) costs ~0.5 s/image on a thin host
and caps mAP evaluation at ~0.7 img/s regardless of the chip.

This module keeps those two steps on the TPU with STATIC shapes:

  * predicted proto-res masks are upsampled into a fixed [C, C] canvas with
    the true (h, w) as *traced* scalars — the bilinear sample positions
    ``src = (i+0.5)*Hp/h - 0.5`` (exact torch/cv2 align_corners=False
    semantics, edge-clamped) are data, not shape, so ONE compilation covers
    every image size in the dataset;
  * gt masks are memcpy'd (no resize) into the same canvas on the host and
    the [D, G] mask-IoU matrix is one MXU matmul.

Only the tiny [D, G] IoU matrices travel back to the host.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _axis_upsample_clamped(x, scale, out_size, axis, limit):
    """Sample x along `axis` at src = (i+0.5)*scale - 0.5 (edge-clamped
    bilinear); rows with i >= limit produce 0."""
    idx = jnp.arange(out_size, dtype=jnp.float32)
    src = (idx + 0.5) * scale - 0.5
    max_src = x.shape[axis] - 1
    src = jnp.clip(src, 0.0, max_src)
    x0 = jnp.floor(src)
    f = src - x0
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, max_src)
    g0 = jnp.take(x, x0i, axis=axis)
    g1 = jnp.take(x, x1i, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    f = f.reshape(shape)
    valid = (idx < limit).reshape(shape)
    return (g0 * (1 - f) + g1 * f) * valid


@partial(jax.jit, static_argnames=('canvas',))
def masks_to_canvas(masks: jnp.ndarray, h, w, canvas: int) -> jnp.ndarray:
    """[D, Hp, Wp] sigmoid masks -> [D, canvas, canvas] binarized, with the
    upsampled mask in the top-left (h, w) region (h, w traced)."""
    Hp, Wp = masks.shape[1], masks.shape[2]
    h = jnp.asarray(h, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    out = _axis_upsample_clamped(masks, Hp / h, canvas, 1, h)
    out = _axis_upsample_clamped(out, Wp / w, canvas, 2, w)
    return (out > 0.5).astype(jnp.float32)


@partial(jax.jit, static_argnames=('canvas',))
def mask_iou_device(pred_masks: jnp.ndarray, gt_canvas: jnp.ndarray,
                    h, w, canvas: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (iou [D, G], crowd_iou [D, G], pred_area [D]).

    pred_masks: [D, Hp, Wp] proto-res sigmoid masks (already cropped);
    gt_canvas: [G, canvas, canvas] float 0/1 (gt in the (h, w) region).
    crowd_iou = inter / pred_area (the iscrowd variant).
    """
    pm = masks_to_canvas(pred_masks, h, w, canvas)
    D = pm.shape[0]
    G = gt_canvas.shape[0]
    a = pm.reshape(D, -1)
    b = gt_canvas.reshape(G, -1)
    inter = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    pa = a.sum(axis=1)
    ga = b.sum(axis=1)
    union = pa[:, None] + ga[None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1), 0.0)
    crowd = jnp.where(pa[:, None] > 0,
                      inter / jnp.where(pa[:, None] > 0, pa[:, None], 1), 0.0)
    return iou, crowd, pa


def gt_to_canvas(gt_masks: np.ndarray, canvas: int) -> np.ndarray:
    """Host: place [G, h, w] bool gt masks into [G, canvas, canvas]."""
    G, h, w = gt_masks.shape
    out = np.zeros((G, canvas, canvas), np.float32)
    out[:, :h, :w] = gt_masks
    return out


def gt_to_canvas_packed(gt_masks: np.ndarray, canvas: int,
                        g_bucket: int = 8) -> np.ndarray:
    """Host: bit-pack [G, h, w] bool gt into [Gpad, canvas, canvas/8] uint8
    (8x less host->device traffic; G padded to a bucket to bound the number
    of compiled shapes)."""
    G, h, w = gt_masks.shape
    gpad = -(-max(G, 1) // g_bucket) * g_bucket
    out = np.zeros((gpad, canvas, canvas), bool)
    out[:G, :h, :w] = gt_masks > 0
    return np.packbits(out, axis=-1)


@partial(jax.jit, static_argnames=('canvas',))
def mask_iou_device_packed(pred_masks: jnp.ndarray, gt_packed: jnp.ndarray,
                           h, w, canvas: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Like :func:`mask_iou_device` but gt arrives bit-packed
    ([Gpad, canvas, canvas/8] uint8, MSB-first like np.packbits)."""
    from yolact_tpu.ops.bits import unpack_bits_last
    gt = unpack_bits_last(gt_packed, canvas).astype(jnp.float32)
    return mask_iou_device(pred_masks, gt, h, w, canvas)


def dataset_canvas_size(dataset, align: int = 64) -> int:
    """Smallest aligned square holding every image in the dataset.

    No silent cap: gt_to_canvas* assume every image fits the canvas, so
    the caller must decide what to do with oversized datasets (evaluate.py
    falls back to the host metrics path above 1024)."""
    m = 0
    for im in dataset.coco.imgs.values():
        m = max(m, im.get('height', 0), im.get('width', 0))
    m = max(m, align)
    return -(-m // align) * align
