"""Fused Pallas DCNv2 forward: bilinear gather + modulation + GEMM in VMEM.

TPU-native analogue of the reference CUDA pipeline
(``/root/reference/external/DCNv2/src/cuda/dcn_v2_cuda.cu:42-172`` —
im2col gather then GEMM) that never materializes the im2col tensor in
HBM.  The XLA formulation (`kernels/dcn.py`) pays, per DCN layer, an
HBM write of the raw `[N,2,2,C]` corner blocks, a read+write for the
corner reduction, and a read for the GEMM — ~800 MB/layer at the
yolact_plus C3 stage (b8).  Here everything between the feature map and
the conv output lives in VMEM:

  grid (batch, position-tiles); per step:
    1. the padded feature slab `[R, C]` of one image is VMEM-resident
       (R = (H+2)(W+2) flattened rows, 1-px zero ring for OOB corners);
    2. per kernel tap t (row-major K×K), gather the four bilinear
       corner rows for TILE_P output positions via in-kernel
       `take_along_axis` (Mosaic dynamic-gather) or a `pl.ds` scalar
       loop (`YOLACT_TPU_PALLAS_DCN_LOOP=1`),
    3. multiply by corner weights with the sigmoid mask FOLDED in
       (mask_t · Σ w_c · corner_c = Σ (mask_t w_c) · corner_c), and
    4. contract `[TILE_P, C] @ [C, Cout]` on the MXU, accumulating over
       taps in f32.

Sample indexing is TAP-MAJOR (n = t·P + p) so each tap's positions form
a contiguous sublane block — the per-tap GEMM accumulation needs no
sublane↔lane reshape of the gathered columns.

Inference-only: the train step keeps the differentiable XLA formulation
(`deform_conv2d`); this kernel is selected via `use_pallas=True` from
the inference wrapper.  Exactness contract matches `kernels/dcn.py`:
far-OOB offsets stay exact because clipped starts only shift blocks
whose misread corners are zero-weighted (oracle: tests/test_dcn.py).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_P = 512          # output positions per grid step (samples = 9·TILE_P)


def _kernel_taa(idx_ref, w4_ref, slab_ref, wgt_ref, out_ref, *, K2, R, Wp,
                acc_dtype=jnp.float32):
    """idx_ref: [1, K2, TILE_P, 1] int32 top-left flat row per sample
    w4_ref:  [1, K2, TILE_P, 4] f32 mask-folded corner weights
    slab_ref:[1, R, C]          feature slab (padded, flattened)
    wgt_ref: [K2, C, Cout]      conv weight per tap
    out_ref: [1, TILE_P, Cout]
    """
    slab = slab_ref[0]
    C = slab.shape[1]
    acc = None
    for t in range(K2):
        # Mosaic's dynamic-gather lowering needs indices shaped like the
        # gather output (interpret mode broadcasts [TILE_P,1] silently;
        # compiled lowering rejects it with a shape mismatch)
        idx = jnp.broadcast_to(idx_ref[0, t], (idx_ref.shape[2], C))
        w = w4_ref[0, t]                                      # [TILE_P, 4]
        g00 = jnp.take_along_axis(slab, idx, axis=0)
        g01 = jnp.take_along_axis(slab, jnp.minimum(idx + 1, R - 1), axis=0)
        g10 = jnp.take_along_axis(slab, jnp.minimum(idx + Wp, R - 1), axis=0)
        g11 = jnp.take_along_axis(slab, jnp.minimum(idx + Wp + 1, R - 1),
                                  axis=0)
        cols = (g00.astype(jnp.float32) * w[:, 0:1] +
                g01.astype(jnp.float32) * w[:, 1:2] +
                g10.astype(jnp.float32) * w[:, 2:3] +
                g11.astype(jnp.float32) * w[:, 3:4])          # [TILE_P, C]
        part = jax.lax.dot_general(
            cols.astype(slab.dtype), wgt_ref[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)                 # [TILE_P, Cout]
        acc = part if acc is None else acc + part
    out_ref[0] = acc.astype(out_ref.dtype)


def _kernel_loop(idx_ref, w4_ref, slab_ref, wgt_ref, out_ref, cols_ref, *,
                 K2, R, Wp, acc_dtype=jnp.float32):
    """`pl.ds` scalar-loop variant; cols_ref is a [TILE_P, C] VMEM scratch.
    idx_ref lives in SMEM ([1, K2, TILE_P] int32, no lane dim)."""
    tile_p = cols_ref.shape[0]
    acc = None
    for t in range(K2):
        w = w4_ref[0, t]                                      # [TILE_P, 4]

        def body(p, _):
            r0 = idx_ref[0, t, p]
            top = slab_ref[0, pl.ds(r0, 2), :].astype(jnp.float32)  # [2, C]
            r1 = jnp.minimum(r0 + Wp, R - 2)
            bot = slab_ref[0, pl.ds(r1, 2), :].astype(jnp.float32)  # [2, C]
            cols_ref[pl.ds(p, 1), :] = (
                top[0:1] * w[p, 0] + top[1:2] * w[p, 1] +
                bot[0:1] * w[p, 2] + bot[1:2] * w[p, 3]
            ).astype(cols_ref.dtype)
            return 0

        jax.lax.fori_loop(0, tile_p, body, 0)
        part = jax.lax.dot_general(
            cols_ref[...], wgt_ref[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)
        acc = part if acc is None else acc + part
    out_ref[0] = acc.astype(out_ref.dtype)


def deform_conv2d_pallas(x: jnp.ndarray,
                         offset: jnp.ndarray,
                         mask: jnp.ndarray,
                         weight: jnp.ndarray,
                         bias: Optional[jnp.ndarray] = None,
                         stride: int = 1,
                         padding: int = 1,
                         dilation: int = 1,
                         *,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in for `kernels.dcn.deform_conv2d` (inference forward).

    x: [B,H,W,Cin] NHWC; offset: [B,Ho,Wo,2K²] (dy,dx per tap);
    mask: [B,Ho,Wo,K²] post-sigmoid; weight: [K,K,Cin,Cout] HWIO.
    """
    B, H, W, Cin = x.shape
    K = weight.shape[0]
    K2 = K * K
    Ho = (H + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    P = Ho * Wo
    Wp = W + 2
    R = (H + 2) * Wp

    # ---- coordinates + mask-folded corner weights (XLA, fused/cheap) ----
    dt = jnp.float32
    hs = jnp.arange(Ho, dtype=dt) * stride - padding
    ws = jnp.arange(Wo, dtype=dt) * stride - padding
    kh = jnp.arange(K, dtype=dt) * dilation
    base_y = (hs[:, None, None, None] + kh[None, None, :, None])
    base_x = (ws[None, :, None, None] + kh[None, None, None, :])
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, K, K)).reshape(1, P, K2)
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, K, K)).reshape(1, P, K2)
    off = offset.astype(dt).reshape(B, P, K2, 2)
    ys = base_y + off[..., 0]                                  # [B, P, K2]
    xs = base_x + off[..., 1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def cw(dy, dx, w):
        valid = ((y0i + dy >= 0) & (y0i + dy < H) &
                 (x0i + dx >= 0) & (x0i + dx < W))
        return w * valid

    m = mask.astype(dt).reshape(B, P, K2)
    w4 = jnp.stack([cw(0, 0, (1 - wy1) * (1 - wx1)) * m,
                    cw(0, 1, (1 - wy1) * wx1) * m,
                    cw(1, 0, wy1 * (1 - wx1)) * m,
                    cw(1, 1, wy1 * wx1) * m], axis=-1)         # [B, P, K2, 4]
    r0 = (jnp.clip(y0i + 1, 0, H) * Wp + jnp.clip(x0i + 1, 0, W))  # [B,P,K2]

    # tap-major layout + position-tile padding
    nt = -(-P // _TILE_P)
    pp = nt * _TILE_P - P
    idx_tm = jnp.pad(r0.transpose(0, 2, 1), ((0, 0), (0, 0), (0, pp)))
    w4_tm = jnp.pad(w4.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, pp),
                                               (0, 0)))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    slab = xp.reshape(B, R, Cin)
    wgt = weight.astype(x.dtype).reshape(K2, Cin, -1)
    Cout = wgt.shape[-1]

    use_loop = os.environ.get('YOLACT_TPU_PALLAS_DCN_LOOP') == '1'
    if use_loop:
        kern = partial(_kernel_loop, K2=K2, R=R, Wp=Wp)
        out = pl.pallas_call(
            kern,
            grid=(B, nt),
            in_specs=[
                pl.BlockSpec((1, K2, _TILE_P), lambda b, t: (b, 0, t),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, K2, _TILE_P, 4), lambda b, t: (b, 0, t, 0)),
                pl.BlockSpec((1, R, Cin), lambda b, t: (b, 0, 0)),
                pl.BlockSpec((K2, Cin, Cout), lambda b, t: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, _TILE_P, Cout),
                                   lambda b, t: (b, t, 0)),
            out_shape=jax.ShapeDtypeStruct((B, nt * _TILE_P, Cout), x.dtype),
            scratch_shapes=[pltpu.VMEM((_TILE_P, Cin), x.dtype)],
            interpret=interpret,
        )(idx_tm, w4_tm.astype(jnp.float32), slab, wgt)
    else:
        kern = partial(_kernel_taa, K2=K2, R=R, Wp=Wp)
        out = pl.pallas_call(
            kern,
            grid=(B, nt),
            in_specs=[
                pl.BlockSpec((1, K2, _TILE_P, 1), lambda b, t: (b, 0, t, 0)),
                pl.BlockSpec((1, K2, _TILE_P, 4), lambda b, t: (b, 0, t, 0)),
                pl.BlockSpec((1, R, Cin), lambda b, t: (b, 0, 0)),
                pl.BlockSpec((K2, Cin, Cout), lambda b, t: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, _TILE_P, Cout),
                                   lambda b, t: (b, t, 0)),
            out_shape=jax.ShapeDtypeStruct((B, nt * _TILE_P, Cout), x.dtype),
            interpret=interpret,
        )(idx_tm[..., None], w4_tm.astype(jnp.float32), slab, wgt)

    out = out[:, :P]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(B, Ho, Wo, Cout)
