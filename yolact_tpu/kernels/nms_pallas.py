"""Fast-NMS suppression as a Pallas TPU kernel.

Computes, per class, the strict-upper-triangular column max of the pairwise
IoU matrix over the score-sorted top-k boxes — the whole suppression
decision of fast_nms (``detection.py:137-166``) — in one fused kernel: the
[k, k] IoU matrix lives only in VMEM (registers/vector memory), never HBM.
The per-class top-k gather stays in XLA (sort is already optimal there).

Layout: boxes come in as 4 separate [C, K] planes so each program works on
[1, K] lanes; K is padded to a lane multiple by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x1_ref, y1_ref, x2_ref, y2_ref, out_ref):
    """Processes a [TC, K] tile of classes; the IoU cube [TC, K, K] lives
    only in VMEM."""
    x1 = x1_ref[:]
    y1 = y1_ref[:]
    x2 = x2_ref[:]
    y2 = y2_ref[:]
    tc, k = x1.shape

    ix = jnp.minimum(x2[:, :, None], x2[:, None, :]) - \
        jnp.maximum(x1[:, :, None], x1[:, None, :])
    iy = jnp.minimum(y2[:, :, None], y2[:, None, :]) - \
        jnp.maximum(y1[:, :, None], y1[:, None, :])
    inter = jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)
    area = (x2 - x1) * (y2 - y1)
    union = area[:, :, None] + area[:, None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (tc, k, k), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tc, k, k), 2)
    upper = (cols > rows).astype(iou.dtype)
    out_ref[:] = jnp.max(iou * upper, axis=1)


@jax.jit
def nms_iou_max_pallas(boxes: jnp.ndarray) -> jnp.ndarray:
    """boxes [C, K, 4] score-sorted point form -> iou_max [C, K]: the max
    IoU of each box against any higher-scoring box of the same class."""
    C, K, _ = boxes.shape
    TC = 8
    pad_c = (-C) % TC
    if pad_c:
        boxes = jnp.pad(boxes, ((0, pad_c), (0, 0), (0, 0)))
    Cp = C + pad_c
    planes = [boxes[:, :, i].astype(jnp.float32) for i in range(4)]
    out = pl.pallas_call(
        _kernel,
        grid=(Cp // TC,),
        in_specs=[pl.BlockSpec((TC, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((TC, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cp, K), jnp.float32),
    )(*planes)
    return out[:C]
