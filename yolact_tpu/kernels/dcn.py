"""Modulated deformable convolution (DCNv2) for TPU.

TPU-native replacement for the reference CUDA extension
(``/root/reference/external/DCNv2/src/cuda/dcn_v2_cuda.cu:42-172`` — im2col
gather + GEMM).  Formulation (third iteration, trace-driven — see PERF.md
"DCN anatomy"):

  1. ONE ``lax.gather`` of a [2,2,C] corner block per sample from the
     zero-padded feature map — all four bilinear corners in one issued
     slice (two W-contiguous segments).  Measured alternatives: four
     per-corner row gathers are ~4x slower (per-issue overhead); a
     lane-concatenated "xquad" [B,H+1,W+1,4C] map that makes each sample
     one contiguous 4C run gains nothing at b8 (the gather is
     volume-bound, not segment-bound — scripts/bench_gather.py), loses
     ~9% at b1, and blows compile time up on the 101-layer DCN config.
  2. The bilinear corner reduction is a single multiply-sum fusion
     straight off the gather output's [B*N, 4, C] view — no per-corner
     slice consumers (those made XLA materialize four corner planes plus
     four physical reshapes of the im2col tensor, ~26 ms/step at
     yolact_plus b8, as much as the gathers themselves).
  3. One canonical 2D GEMM ``[B*P, K*K*C] @ [K*K*C, Cout]`` (MXU), with
     the sigmoid mask modulation riding the lane-broadcast multiply that
     feeds it (the batched ``bpc,co->bpo`` einsum form made XLA pick a
     {2,0,1} lhs layout and physically relayout the im2col tensor).

Differentiable via a hand-written custom VJP (round 5): the block
gather's raw autodiff transpose is a duplicate-index [2,2,C] block
scatter-add that XLA:TPU executes serially (~4 µs/update — 1.37 s for
ONE 69² layer, results/plus_train_r5f.txt), so the backward instead
scatters per-corner ROWS (the take_along_axis transpose, ~14 ns/update)
and reuses the forward's corner blocks as a residual for the coordinate
grads.  25–35× on the yolact_plus train step; grads oracle-pinned to
torch autodiff through the reference-semantics transcription
(tests/test_dcn.py::test_dcn_backward_oracle_vs_reference).  Used for
both training and inference.

Offset/mask channel layout matches the CUDA kernel
(``dcn_v2_im2col_cuda.cu:125-180``): for tap t (row-major over the K x K
kernel), offset channels are ``2t`` (dy) and ``2t+1`` (dx); mask channel is
``t`` after sigmoid.  Out-of-bounds bilinear corners contribute zero
(``dcn_v2_im2col_cuda.cu:25-54``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _bilinear_gather_rows(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                          ) -> jnp.ndarray:
    """Round-2 formulation: 4 per-corner row gathers via take_along_axis
    over the flattened H*W map.  Same math as :func:`_bilinear_gather`
    (oracle-identical; grads agree to f32 noise).

    Kept as the autodiff REFERENCE for the hand-written backward below
    (its transpose is the fast per-batch row scatter the custom VJP
    reproduces — test_dcn.py cross-validates the two) and for the
    formulation A/B in scripts/probe_dcn_bwd.py."""
    B, H, W, C = x.shape
    x_flat = x.reshape(B, H * W, C)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1
    out = 0.
    for dy, wy in ((0, wy0), (1, wy1)):
        for dx, wx in ((0, wx0), (1, wx1)):
            yi = y0.astype(jnp.int32) + dy
            xi = x0.astype(jnp.int32) + dx
            valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            g = jnp.take_along_axis(x_flat, idx[..., None], axis=1)
            w = (wy * wx * valid).astype(x.dtype)
            out = out + g * w[..., None]
    return out


def _bilinear_gather_block(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                           return_blocks: bool = False):
    """Zero-padded bilinear sampling — the block-gather formulation
    (fastest FORWARD; its raw autodiff transpose is the slow block
    scatter-add, so production routes grads through the custom VJP in
    :func:`_bilinear_gather` below.  This raw form stays importable for
    the A/B probe, scripts/probe_dcn_bwd.py).

    x:  [B, H, W, C]
    ys, xs: [B, N] float sample coordinates (pixel space)
    returns [B, N, C]

    OOB handling: the 1-pixel zero ring supplies corners one step outside
    the image; anything further out gets its start clipped, which shifts
    the fetched block — but every corner a shifted block could misread is
    provably out of bounds and zero-weighted (``valid``), so the math
    stays exact (test_dcn.py oracle covers far-OOB offsets).
    """
    B, H, W, C = x.shape
    N = ys.shape[1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # Flat [B*N] gather with an EXPLICIT batch coordinate in the start
    # vectors instead of operand_batching_dims: XLA lowers the batched
    # form by flattening and re-expanding, which materializes a full
    # relayout copy of the gathered tensor (~1.4 ms per DCN layer at b8,
    # profiled) — the flat form keeps the gather output in its natural
    # layout end to end.
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (B, N), 0).reshape(-1, 1)
    starts = jnp.concatenate([
        b_idx,
        jnp.clip(y0i + 1, 0, H).reshape(-1, 1),
        jnp.clip(x0i + 1, 0, W).reshape(-1, 1)], axis=-1)    # [B*N, 3]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),               # the [2, 2, C] block dims
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )
    blocks = jax.lax.gather(
        xp, starts, dn, slice_sizes=(1, 2, 2, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)  # [B*N, 2, 2, C]

    def corner_w(dy, dx, wy, wx):
        valid = ((y0i + dy >= 0) & (y0i + dy < H) &
                 (x0i + dx >= 0) & (x0i + dx < W))
        return (wy * wx * valid).astype(x.dtype).reshape(-1)   # [B*N]

    # [B*N, 4] corner weights, same order as the block's (2,2) row-major
    # corner layout
    mw = jnp.stack([corner_w(0, 0, wy0, wx0), corner_w(0, 1, wy0, wx1),
                    corner_w(1, 0, wy1, wx0), corner_w(1, 1, wy1, wx1)],
                   axis=-1)
    # single fused weighted corner reduction off the gather output: the
    # [B*N, 4, C] view of the block tensor is a bitcast, and the one
    # multiply-sum keeps XLA from splitting per-corner pipelines
    out = jnp.sum(blocks.reshape(-1, 4, C) * mw[:, :, None], axis=1)
    out = out.reshape(B, N, C)
    if return_blocks:
        return out, blocks
    return out


@jax.custom_vjp
def _bilinear_gather(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                     ) -> jnp.ndarray:
    """Production bilinear sampler: block-gather forward (fastest
    measured formulation) with a hand-written backward whose grad_x is
    the row-scatter transpose (fastest measured) and whose coordinate
    grads reuse the forward's corner blocks as a residual — 25× on the
    yolact_plus train step vs raw autodiff of the block gather
    (NOTES.md "plus-train crash: root cause (round 5)")."""
    return _bilinear_gather_block(x, ys, xs)


def _bilinear_gather_fwd(x, ys, xs):
    out, blocks = _bilinear_gather_block(x, ys, xs, return_blocks=True)
    # blocks ([B*N,2,2,C]) rides along as a residual: under the default
    # cfg.train_remat='dcn' the bottleneck forward is replayed at
    # backward time anyway, so this costs no HBM and saves the backward
    # a re-gather; with remat off it trades ~4x the layer activation in
    # HBM for that re-gather.
    return out, (x, ys, xs, blocks)


def _bilinear_gather_bwd(res, g):
    """Hand-written transpose.  Three pieces, each in its fastest form:

      grad_x   4 per-corner ROW scatters (the take_along_axis transpose
               — per-batch row scatter-add, ~14 ns/update measured) via
               jax.vjp of the linear gather, so XLA forms exactly the
               scatter it forms for the row formulation.  The block
               gather's own transpose (duplicate-index [2,2,C] block
               scatter-add) runs ~4 µs/update — 34× slower per layer
               (results/plus_train_r5f.txt).
      grad_ys/ grad_xs   elementwise from the saved corner blocks
               (d w_c/d coord; floor contributes zero).
      weights  corner weights recomputed from (ys, xs) — cheap VPU math.
    """
    x, ys, xs, blocks = res
    B, H, W, C = x.shape
    N = ys.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def valid(dy, dx):
        return ((y0i + dy >= 0) & (y0i + dy < H) &
                (x0i + dx >= 0) & (x0i + dx < W))

    v00, v01, v10, v11 = (valid(0, 0), valid(0, 1),
                          valid(1, 0), valid(1, 1))

    # corner values [B, N, 4, C], row-major corner order like the fwd
    vals = blocks.reshape(B, N, 4, C)
    # gv_c = <g, corner_c> over C, f32 accumulation           [B, N, 4]
    gv = jnp.sum(g[:, :, None, :].astype(jnp.float32) *
                 vals.astype(jnp.float32), axis=-1)

    f32 = jnp.float32
    grad_ys = (gv[..., 0] * (-(wx0 * v00)).astype(f32) +
               gv[..., 1] * (-(wx1 * v01)).astype(f32) +
               gv[..., 2] * (wx0 * v10).astype(f32) +
               gv[..., 3] * (wx1 * v11).astype(f32)).astype(ys.dtype)
    grad_xs = (gv[..., 0] * (-(wy0 * v00)).astype(f32) +
               gv[..., 1] * (wy0 * v01).astype(f32) +
               gv[..., 2] * (-(wy1 * v10)).astype(f32) +
               gv[..., 3] * (wy1 * v11).astype(f32)).astype(xs.dtype)

    # grad_x: per-corner row scatter-add over the flattened H*W map —
    # jax.vjp of the (linear) gather yields the pure transpose; the
    # unused forward gathers are dead code under jit
    idx = []
    cot = []
    for dy, dx, w, vd in ((0, 0, wy0 * wx0, v00), (0, 1, wy0 * wx1, v01),
                          (1, 0, wy1 * wx0, v10), (1, 1, wy1 * wx1, v11)):
        yi = jnp.clip(y0i + dy, 0, H - 1)
        xi = jnp.clip(x0i + dx, 0, W - 1)
        idx.append(yi * W + xi)
        cot.append(g * (w * vd).astype(g.dtype)[..., None])

    x_flat = x.reshape(B, H * W, C)

    def gather4(xf):
        return tuple(jnp.take_along_axis(xf, i[..., None], axis=1)
                     for i in idx)

    _, vjp4 = jax.vjp(gather4, x_flat)
    (gx_flat,) = vjp4(tuple(cot))
    return gx_flat.reshape(B, H, W, C), grad_ys, grad_xs


_bilinear_gather.defvjp(_bilinear_gather_fwd, _bilinear_gather_bwd)


def deform_conv2d(x: jnp.ndarray,
                  offset: jnp.ndarray,
                  mask: jnp.ndarray,
                  weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  stride: int = 1,
                  padding: int = 1,
                  dilation: int = 1,
                  gather_impl=None) -> jnp.ndarray:
    """Modulated deformable conv (DCNv2) forward.

    Args:
      x:      [B, H, W, Cin]   input features (NHWC)
      offset: [B, Ho, Wo, 2*K*K]  tap offsets, layout (dy, dx) per tap
      mask:   [B, Ho, Wo, K*K]    modulation after sigmoid
      weight: [K, K, Cin, Cout]   HWIO
      bias:   [Cout] or None
      gather_impl: bilinear sampler override for formulation A/B probes
        (scripts/probe_dcn_bwd.py passes _bilinear_gather_block or
        _bilinear_gather_rows); production leaves it None =
        _bilinear_gather (custom VJP).
    Returns [B, Ho, Wo, Cout].
    """
    B, H, W, Cin = x.shape
    K = weight.shape[0]
    Ho = (H + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    assert offset.shape == (B, Ho, Wo, 2 * K * K), (offset.shape, (B, Ho, Wo, 2 * K * K))

    # Base sampling grid per tap: p = p0*stride - pad + k*dilation + offset
    hs = jnp.arange(Ho, dtype=x.dtype) * stride - padding
    ws = jnp.arange(Wo, dtype=x.dtype) * stride - padding
    kh = jnp.arange(K, dtype=x.dtype) * dilation
    base_y = hs[:, None, None, None] + kh[None, None, :, None]       # [Ho,1,K,1]
    base_x = ws[None, :, None, None] + kh[None, None, None, :]       # [1,Wo,1,K]
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, K, K)).reshape(1, Ho, Wo, K * K)
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, K, K)).reshape(1, Ho, Wo, K * K)

    off = offset.reshape(B, Ho, Wo, K * K, 2)
    ys = (base_y + off[..., 0]).reshape(B, Ho * Wo * K * K)
    xs = (base_x + off[..., 1]).reshape(B, Ho * Wo * K * K)

    sampler = gather_impl or _bilinear_gather
    cols = sampler(x, ys, xs)                         # [B, Ho*Wo*K*K, Cin]
    # sigmoid-mask modulation stays in lane-land ([B, P, K*K] broadcast
    # over C) — folding it into the corner weights would need a
    # lanes->rows transpose of the mask (the pathological relayout the
    # coordinate tensors already pay once; don't pay it twice)
    cols = (cols.reshape(B, Ho * Wo, K * K, Cin) *
            mask.reshape(B, Ho * Wo, K * K, 1).astype(cols.dtype))

    # one canonical 2D GEMM: [B*P, K*K*Cin] @ [K*K*Cin, Cout] (the
    # batched 'bpc,co->bpo' einsum form made XLA pick a {2,0,1} lhs
    # layout and physically relayout the im2col tensor to feed it)
    w = weight.reshape(K * K * Cin, -1)
    out = jax.lax.dot_general(
        cols.reshape(B * Ho * Wo, K * K * Cin), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(B, Ho, Wo, -1)
