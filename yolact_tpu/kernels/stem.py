"""Fused im2col Pallas kernel for the space-to-depth ResNet stem conv.

The s2d stem (``models/layers.py:s2d_stem_kernel``) turns the reference's
7x7/s2/p3 stem (``backbone.py:106-110``) into a 4x4/s1/pad(2,1) conv over
a 2x2 space-to-depth input — but with only 12 input channels the XLA conv
runs lane-starved (~5% MXU, 1.55 ms of a 13 ms b8@550 step).  This kernel
builds the im2col operand in VMEM instead:

  per x-tap n (4): the four y-tap slices of the block concat along lanes
  (all pieces share sublane phase n, which Mosaic accepts — a single
  16-piece concat mixes phases and is rejected), then one
  [RB, WP, 4*C] x [4*C, O] ``dot_general`` accumulates in f32.

The [*, 4*C] operand never touches HBM.  Input rows are halo-duplicated
into per-block windows XLA-side (cheap: the stack is a fused copy), so the
BlockSpec grid tiles exactly.  Measured on one v5e chip at [8,275,275,12]:
0.53 ms kernel vs 1.55 ms for the XLA conv.

**Why this is OPT-IN (YOLACT_TPU_PALLAS_STEM=1), not the default.**  The
3x op-level win does not survive integration: XLA fuses the whole
[device preprocess -> one-hot s2d shuffle -> stem conv] chain into one
~1.55 ms op, and splitting the conv out into a custom call forces the
chain apart — the s2d shuffle materializes standalone (~1.1 ms), a
layout copy appears at the custom-call boundary (~0.5 ms, pallas requires
row-major while the conv producer prefers a spatial-major layout), and
the BN/ReLU epilogue un-fuses from the maxpool (~0.5 ms).  Net e2e:
b8 592 -> ~510 fps.  Kept as a working artifact + measurement; a future
XLA version with custom-call layout negotiation may change the verdict.

Gradients: ``stem_conv_s2d`` wraps the kernel in a ``custom_vjp`` whose
backward is the VJP of the identical XLA conv, so training with
``--stem_s2d`` differentiates exactly as before.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_xla(x, w2):
    """The reference formulation: 4x4/s1/pad(2,1) conv (NHWC/HWIO)."""
    return jax.lax.conv_general_dilated(
        x, w2, (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _kernel(x_ref, w_ref, out_ref, *, rb, wp):
    # x_ref [1,rb+3,wp+3,C]; w_ref [4,4C,O]; out_ref [1,rb,w,O]
    o = w_ref.shape[-1]
    w_out = out_ref.shape[2]
    acc = jnp.zeros((rb, wp, o), jnp.float32)
    for n in range(4):
        xs = x_ref[0, :, n:n + wp, :]                    # [rb+3, wp, C]
        a = jnp.concatenate([xs[m:m + rb] for m in range(4)], axis=-1)
        acc += jax.lax.dot_general(
            a, w_ref[n], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[0] = acc[:, :w_out].astype(out_ref.dtype)


def _pick_rb(h: int, wp: int) -> int:
    # rows per program: keep x-window + operand + f32 acc under ~8 MB of
    # VMEM (each row costs ~wp * 128 lanes * (2+2+4) bytes across the 3);
    # prefer an exact divisor of h so the output needs no row crop
    cap = max(8, min(32, (8 << 20) // (wp * 128 * 8)))
    for d in range(cap, 7, -1):
        if h % d == 0:
            return d
    return cap


@functools.partial(jax.jit, static_argnames=('interpret',))
def stem_conv_s2d_pallas(x, w2, interpret: bool = False):
    """x [B, H, W, C] (s2d input), w2 [4, 4, C, O] -> [B, H, W, O]."""
    b, h, w, c = x.shape
    o = w2.shape[-1]
    wp = -(-w // 8) * 8                       # lane-merge-legal x width
    rb = _pick_rb(h, wp)
    nb = -(-h // rb)
    hp = nb * rb
    xp = jnp.pad(x, ((0, 0), (2, hp + 3 - 2 - h), (2, wp + 3 - 2 - w),
                     (0, 0)))
    # halo-duplicated row windows, flattened 4-D so block ri rows
    # [(rb+3)*ri, (rb+3)*(ri+1)) hold input rows [rb*ri, rb*ri + rb + 3)
    xh = jnp.concatenate([xp[:, rb * i: rb * i + rb + 3] for i in range(nb)],
                         axis=1)
    wn = w2.transpose(1, 0, 2, 3).reshape(4, 4 * c, o)
    out = pl.pallas_call(
        functools.partial(_kernel, rb=rb, wp=wp),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, rb + 3, wp + 3, c),
                         lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4 * c, o), lambda bi, ri: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, w, o),
                               lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, o), x.dtype),
        interpret=interpret,
    )(xh, wn)
    return out if hp == h else out[:, :h]


@jax.custom_vjp
def stem_conv_s2d(x, w2):
    """s2d stem conv: Pallas on TPU, XLA elsewhere; XLA-conv gradients.

    Per-platform lowering via ``lax.platform_dependent`` (not a trace-time
    backend check) so a multi-platform AOT export (--platforms=tpu,cpu)
    gets the Pallas body only in its TPU lowering.

    ``YOLACT_TPU_PALLAS_STEM_INTERPRET=1`` makes the non-TPU lowering run
    the actual Pallas kernel body in interpret mode instead of the XLA
    conv — used by the SPMD dryrun/tests to validate the kernel under
    sharded graphs without TPU hardware."""
    import os
    default = _conv_xla
    if os.environ.get('YOLACT_TPU_PALLAS_STEM_INTERPRET'):
        default = lambda a, b: stem_conv_s2d_pallas(a, b, interpret=True)
    return jax.lax.platform_dependent(
        x, w2,
        tpu=lambda a, b: stem_conv_s2d_pallas(a, b),
        default=default)


def _fwd(x, w2):
    return stem_conv_s2d(x, w2), (x, w2)


def _bwd(res, g):
    x, w2 = res
    _, vjp = jax.vjp(_conv_xla, x, w2)
    return vjp(g)


stem_conv_s2d.defvjp(_fwd, _bwd)
