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
    """One program assembles TILE_D masks.

    proto_ref:  [Hp*Wp, Md]   (full prototypes, replicated per program)
    coeffs_ref: [TILE_D, Md]
    boxes_ref:  [TILE_D, 4]   relative point-form boxes
    out_ref:    [TILE_D, Hp*Wp]
    """
    coeffs = coeffs_ref[:]
    proto = proto_ref[:]
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

    bx1 = boxes_ref[:, 0:1] * wp
    bx2 = boxes_ref[:, 2:3] * wp
    by1 = boxes_ref[:, 1:2] * hp
    by2 = boxes_ref[:, 3:4] * hp
    x1 = jnp.minimum(bx1, bx2)
    x2 = jnp.maximum(bx1, bx2)
    y1 = jnp.minimum(by1, by2)
    y2 = jnp.maximum(by1, by2)
    x1 = jnp.maximum(x1 - padding, 0.0)
    x2 = jnp.minimum(x2 + padding, float(wp))
    y1 = jnp.maximum(y1 - padding, 0.0)
    y2 = jnp.minimum(y2 + padding, float(hp))

    keep = ((xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2))
    out_ref[:] = m * keep.astype(m.dtype)


@functools.partial(jax.jit, static_argnames=('padding',))
def assemble_masks_pallas(proto: jnp.ndarray, coeffs: jnp.ndarray,
                          boxes: jnp.ndarray, padding: int = 1
                          ) -> jnp.ndarray:
    """proto [Hp, Wp, Md]; coeffs [D, Md]; boxes [D, 4] -> [D, Hp, Wp].

    One program assembles all D masks (D=100 at eval: out block
    100 x Hp*Wp ≈ 7.6 MB + 2.4 MB prototypes fits VMEM comfortably).
    """
    hp, wp, md = proto.shape
    d = coeffs.shape[0]
    proto_flat = proto.reshape(hp * wp, md).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, hp=hp, wp=wp, padding=float(padding)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, hp * wp), jnp.float32),
    )(proto_flat, coeffs.astype(jnp.float32), boxes.astype(jnp.float32))
    return out.reshape(d, hp, wp)


def assemble_masks_xla(proto, coeffs, boxes, padding: int = 1):
    """XLA reference implementation (identical math)."""
    from yolact_tpu.ops.boxes import crop
    m = jnp.einsum('hwc,dc->hwd', proto.astype(jnp.float32),
                   coeffs.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    m = jax.nn.sigmoid(m)
    m = crop(m, boxes, padding=padding)
    return jnp.transpose(m, (2, 0, 1))
