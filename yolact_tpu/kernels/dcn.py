"""Modulated deformable convolution (DCNv2) for TPU.

TPU-native replacement for the reference CUDA extension
(``/root/reference/external/DCNv2/src/cuda/dcn_v2_cuda.cu:42-172`` — im2col
gather + GEMM).  Two implementations with identical numerics:

  * :func:`deform_conv2d` — pure-XLA: 4-tap bilinear gather per kernel tap,
    modulated by the sigmoid mask, contracted against the weights with one
    big MXU matmul.  Differentiable (autodiff through gathers), used for
    both training and as the reference for the Pallas kernel.
  * a Pallas kernel (kernels/dcn_pallas.py) for the inference hot path.

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


def _bilinear_gather(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                     ) -> jnp.ndarray:
    """Zero-padded bilinear sampling.

    x:  [B, H, W, C]
    ys, xs: [B, N] float sample coordinates (pixel space)
    returns [B, N, C]
    """
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


def deform_conv2d(x: jnp.ndarray,
                  offset: jnp.ndarray,
                  mask: jnp.ndarray,
                  weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  stride: int = 1,
                  padding: int = 1,
                  dilation: int = 1) -> jnp.ndarray:
    """Modulated deformable conv (DCNv2) forward.

    Args:
      x:      [B, H, W, Cin]   input features (NHWC)
      offset: [B, Ho, Wo, 2*K*K]  tap offsets, layout (dy, dx) per tap
      mask:   [B, Ho, Wo, K*K]    modulation after sigmoid
      weight: [K, K, Cin, Cout]   HWIO
      bias:   [Cout] or None
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

    cols = _bilinear_gather(x, ys, xs)                # [B, Ho*Wo*K*K, Cin]
    cols = cols.reshape(B, Ho * Wo, K * K, Cin)
    cols = cols * mask.reshape(B, Ho * Wo, K * K, 1).astype(cols.dtype)

    w = weight.reshape(K * K * Cin, -1)
    out = jnp.einsum('bpc,co->bpo', cols.reshape(B, Ho * Wo, K * K * Cin), w,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(B, Ho, Wo, -1)
