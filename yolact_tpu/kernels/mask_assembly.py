"""Fused prototype mask assembly: sigmoid(coeffs @ protoᵀ) * crop-window.

Pallas TPU kernel for the post-NMS mask path (reference:
``output_utils.py:69-74`` — ``proto @ masks.t()`` -> sigmoid -> crop).  The
matmul rides the MXU with the prototypes resident in VMEM; the sigmoid and
the crop's index-compare mask fuse into the same kernel so the pre-sigmoid
[D, Hp*Wp] intermediate never touches HBM.

Layout: output is [D, Hp*Wp] (lane dim = flattened pixels) so the crop
bounds compare against `lane % Wp` / `lane // Wp` iotas — all VPU ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(proto_ref, coeffs_ref, boxes_ref, out_ref, *, hp, wp, padding):
    """One program assembles TILE_D masks of one batch element.

    proto_ref:  [1, Hp*Wp, Md]   (full prototypes of this batch element)
    coeffs_ref: [1, TILE_D, Md]
    boxes_ref:  [1, TILE_D, 4]   relative point-form boxes
    out_ref:    [1, TILE_D, Hp*Wp]
    """
    coeffs = coeffs_ref[0]
    proto = proto_ref[0]
    m = jax.lax.dot_general(
        coeffs, proto,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [TILE_D, Hp*Wp]
    m = jax.nn.sigmoid(m)

    # crop: sanitize_coordinates + index compare (box_utils.py:328-373)
    n = m.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    xs = jnp.remainder(lane, wp).astype(jnp.float32)
    ys = (lane // wp).astype(jnp.float32)

    bx1 = boxes_ref[0, :, 0:1] * wp
    bx2 = boxes_ref[0, :, 2:3] * wp
    by1 = boxes_ref[0, :, 1:2] * hp
    by2 = boxes_ref[0, :, 3:4] * hp
    x1 = jnp.minimum(bx1, bx2)
    x2 = jnp.maximum(bx1, bx2)
    y1 = jnp.minimum(by1, by2)
    y2 = jnp.maximum(by1, by2)
    x1 = jnp.maximum(x1 - padding, 0.0)
    x2 = jnp.minimum(x2 + padding, float(wp))
    y1 = jnp.maximum(y1 - padding, 0.0)
    y2 = jnp.minimum(y2 + padding, float(hp))

    keep = ((xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2))
    out_ref[0] = m * keep.astype(m.dtype)


@functools.partial(jax.jit,
                   static_argnames=('padding', 'tile_d', 'interpret'))
def assemble_masks_batched_pallas(proto: jnp.ndarray, coeffs: jnp.ndarray,
                                  boxes: jnp.ndarray, padding: int = 1,
                                  tile_d: int = 8,
                                  interpret: bool = False) -> jnp.ndarray:
    """Batched: proto [B, Hp, Wp, Md]; coeffs [B, D, Md]; boxes [B, D, 4]
    -> [B, D, Hp, Wp].

    Explicit (batch, det-tile) grid — NOT vmap, which would let XLA try to
    scope-allocate the whole output in VMEM.  Per-program blocks:
    prototypes (2.4 MB at 138²) + tile_d x Hp*Wp output (2.4 MB).
    """
    b, hp, wp, md = proto.shape
    d = coeffs.shape[1]
    pad_d = (-d) % tile_d
    if pad_d:
        coeffs = jnp.pad(coeffs, ((0, 0), (0, pad_d), (0, 0)))
        boxes = jnp.pad(boxes, ((0, 0), (0, pad_d), (0, 0)))
    dp = d + pad_d
    proto_flat = proto.reshape(b, hp * wp, md).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, hp=hp, wp=wp, padding=float(padding)),
        grid=(b, dp // tile_d),
        in_specs=[
            pl.BlockSpec((1, hp * wp, md), lambda bi, di: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_d, md), lambda bi, di: (bi, di, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_d, 4), lambda bi, di: (bi, di, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_d, hp * wp),
                               lambda bi, di: (bi, di, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, dp, hp * wp), jnp.float32),
        interpret=interpret,
    )(proto_flat, coeffs.astype(jnp.float32), boxes.astype(jnp.float32))
    return out[:, :d].reshape(b, d, hp, wp)


def assemble_masks_pallas(proto: jnp.ndarray, coeffs: jnp.ndarray,
                          boxes: jnp.ndarray, padding: int = 1,
                          interpret: bool = False) -> jnp.ndarray:
    """Unbatched convenience wrapper: [Hp,Wp,Md] x [D,Md] -> [D,Hp,Wp]."""
    return assemble_masks_batched_pallas(
        proto[None], coeffs[None], boxes[None], padding=padding,
        interpret=interpret)[0]


def assemble_masks_mapped(proto, coeffs, boxes, padding: int = 1,
                          interpret: bool = False):
    """Batch via lax.map over single-image pallas calls.  At batch > 1
    XLA's layout assignment tries to scope the whole batched custom-call
    output in VMEM and OOMs; mapping keeps each per-image output in HBM
    (the pallas grid is sequential on TPU anyway, so this costs nothing).

    ``interpret`` runs the kernel in Pallas interpret mode (CPU) — used by
    the SPMD dryrun/tests to execute the real kernel body (not the XLA
    fallback) under a sharded graph without TPU hardware.
    """
    return jax.lax.map(
        lambda t: assemble_masks_batched_pallas(
            t[0][None], t[1][None], t[2][None], padding=padding,
            interpret=interpret)[0],
        (proto, coeffs, boxes))


def assemble_masks_xla(proto, coeffs, boxes, padding: int = 1):
    """XLA reference implementation (identical math)."""
    from yolact_tpu.ops.boxes import crop
    m = jnp.einsum('hwc,dc->hwd', proto.astype(jnp.float32),
                   coeffs.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    m = jax.nn.sigmoid(m)
    m = crop(m, boxes, padding=padding)
    return jnp.transpose(m, (2, 0, 1))
