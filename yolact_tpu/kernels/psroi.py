"""Deformable position-sensitive RoI pooling (DCNv2) for TPU.

TPU-native replacement for the reference CUDA kernel
(``/root/reference/external/DCNv2/src/cuda/dcn_v2_psroi_pooling_cuda.cu:58-146``
``DeformablePSROIPoolForwardKernel``) and its python wrappers
``DCNv2Pooling`` / ``DCNPooling``
(``/root/reference/external/DCNv2/dcn_v2.py:131-290``).  Not used by YOLACT
itself (it ships with the DCNv2 extension); provided for component parity.

Design: the CUDA kernel is one thread per output scalar with a
``sample_per_part``² inner loop of bilinear taps.  Here every tap of every
output element is materialised as one flat index into the [B*H*W*C] input
(static shapes throughout), executed as a single XLA gather, and reduced
with a masked mean — no scalar loops, differentiable by autodiff (the
bilinear weights carry the coordinate gradient, which is exactly what the
hand-written CUDA backward computes).

Semantics notes (matching the .cu file):
  * RoI coords are **rounded** to ints, end is inclusive (+1), then scaled
    and shifted by -0.5 (``:90-93``).
  * RoIs are clamped to at least 0.1 px (``:96-97``).
  * Samples outside ``[-0.5, dim-0.5]`` are skipped; the output is the mean
    of the surviving taps, 0 if none survive (``:131-143``).
  * Position-sensitivity: output channel ``ctop`` at bin (ph, pw) reads
    input channel ``(ctop*G + gh)*G + gw`` with ``g* = floor(p*·G/P)``
    (``:118-137``).
  * The learned per-part translation ``trans`` is scaled by ``trans_std``
    and by the roi size (``:108-115``).

Layout: input is NHWC (framework convention); ``trans`` keeps the
reference's [N, 2·num_classes, part, part] layout for converter parity.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def deform_psroi_pool(x: jnp.ndarray,
                      rois: jnp.ndarray,
                      trans: Optional[jnp.ndarray],
                      *,
                      spatial_scale: float,
                      pooled_size: int,
                      output_dim: int,
                      no_trans: bool,
                      group_size: int = 1,
                      part_size: Optional[int] = None,
                      sample_per_part: int = 4,
                      trans_std: float = 0.0) -> jnp.ndarray:
    """Deformable PSRoI pooling.

    x:     [B, H, W, C] with C == output_dim * group_size**2
    rois:  [N, 5] rows (batch_idx, x1, y1, x2, y2) in image coordinates
    trans: [N, 2*num_classes, part, part] or None (no_trans)
    returns [N, output_dim, pooled_size, pooled_size]
    """
    B, H, W, C = x.shape
    N = rois.shape[0]
    P = pooled_size
    S = sample_per_part
    G = group_size
    part = P if part_size is None else part_size
    if C != output_dim * G * G:
        raise ValueError(f'C={C} != output_dim*group_size^2='
                         f'{output_dim * G * G}')
    if no_trans:
        num_classes = 1
    else:
        num_classes = trans.shape[1] // 2
    if output_dim % num_classes:
        raise ValueError('output_dim must be divisible by num_classes')
    channels_each_class = output_dim // num_classes

    f32 = jnp.float32
    batch_ind = rois[:, 0].astype(jnp.int32)                     # [N]
    r = jnp.round(rois[:, 1:].astype(f32))
    roi_sw = r[:, 0] * spatial_scale - 0.5                       # [N]
    roi_sh = r[:, 1] * spatial_scale - 0.5
    roi_ew = (r[:, 2] + 1.0) * spatial_scale - 0.5
    roi_eh = (r[:, 3] + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(roi_ew - roi_sw, 0.1)
    roi_h = jnp.maximum(roi_eh - roi_sh, 0.1)
    bin_w = roi_w / P                                            # [N]
    bin_h = roi_h / P
    sub_w = bin_w / S
    sub_h = bin_h / S

    # static per-bin tables (the .cu computes these per thread)
    p_idx = np.arange(P)
    part_hw = np.floor(p_idx / P * part).astype(np.int32)        # [P]
    g_idx = np.clip(np.floor(p_idx * G / P), 0, G - 1).astype(np.int32)

    if no_trans:
        tx = jnp.zeros((N, num_classes, P, P), f32)
        ty = jnp.zeros((N, num_classes, P, P), f32)
    else:
        t = trans.astype(f32).reshape(N, num_classes, 2, part, part)
        t = t[:, :, :, part_hw[:, None], part_hw[None, :]]       # [N,cls,2,P,P]
        tx = t[:, :, 0] * trans_std
        ty = t[:, :, 1] * trans_std

    # bin start positions, per (roi, class, ph, pw)
    pw_f = jnp.asarray(p_idx, f32)
    wstart = (pw_f[None, None, None, :] * bin_w[:, None, None, None]
              + roi_sw[:, None, None, None]
              + tx * roi_w[:, None, None, None])                 # [N,cls,P,P]
    hstart = (pw_f[None, None, :, None] * bin_h[:, None, None, None]
              + roi_sh[:, None, None, None]
              + ty * roi_h[:, None, None, None])

    # sample grid: [N, cls, P(h), P(w), S(h), S(w)]
    s_f = jnp.asarray(np.arange(S), f32)
    ws = wstart[..., None, None] + \
        s_f[None, None, None, None, None, :] * sub_w[:, None, None, None,
                                                     None, None]
    hs = hstart[..., None, None] + \
        s_f[None, None, None, None, :, None] * sub_h[:, None, None, None,
                                                     None, None]

    valid = ((ws >= -0.5) & (ws <= W - 0.5) &
             (hs >= -0.5) & (hs <= H - 0.5))                     # skip OOB taps
    ws = jnp.clip(ws, 0.0, W - 1.0)
    hs = jnp.clip(hs, 0.0, H - 1.0)

    # broadcast class dim -> full output_dim, pick the PS channel per bin
    cls_of_ctop = np.arange(output_dim) // channels_each_class   # [D]
    chan = ((np.arange(output_dim)[:, None, None] * G
             + g_idx[None, :, None]) * G + g_idx[None, None, :]) # [D,P(h),P(w)]

    ws = ws[:, cls_of_ctop]                                      # [N,D,P,P,S,S]
    hs = hs[:, cls_of_ctop]
    valid = valid[:, cls_of_ctop]

    # bilinear taps as one flat gather from [B*H*W*C]
    x0 = jnp.floor(ws)
    y0 = jnp.floor(hs)
    x1 = jnp.ceil(ws)
    y1 = jnp.ceil(hs)
    dx = ws - x0
    dy = hs - y0

    flat = x.reshape(-1)
    base = (batch_ind * H)[:, None, None, None, None, None]      # [N,1,1,1,1,1]
    chan_b = jnp.asarray(chan, jnp.int32)[None, :, :, :, None, None]

    def tap(yi, xi, wgt):
        idx = ((base + yi.astype(jnp.int32)) * W
               + xi.astype(jnp.int32)) * C + chan_b
        return jnp.take(flat, idx.reshape(-1)).reshape(idx.shape) * \
            wgt.astype(x.dtype)

    val = (tap(y0, x0, (1 - dx) * (1 - dy)) +
           tap(y1, x0, (1 - dx) * dy) +
           tap(y0, x1, dx * (1 - dy)) +
           tap(y1, x1, dx * dy))                                 # [N,D,P,P,S,S]

    val = jnp.where(valid, val.astype(f32), 0.0)
    cnt = valid.reshape(*valid.shape[:4], -1).sum(axis=-1)       # [N,D,P,P]
    total = val.reshape(*val.shape[:4], -1).sum(axis=-1)
    return jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), 0.0)


try:  # flax is always present in this image; guard only for doc builds
    from flax import linen as _nn

    class DeformRoIPooling(_nn.Module):
        """``DCNPooling`` equivalent (``dcn_v2.py:223-290``): a plain
        no-trans PSRoI-align pass feeds a 3-layer FC that predicts a
        per-bin (offset, mask); a second deformable pass applies them and
        the output is modulated by sigmoid(mask).  Final FC is zero-init
        so the module starts as plain RoI pooling (``dcn_v2.py:256-257``).
        """
        spatial_scale: float
        pooled_size: int
        output_dim: int
        no_trans: bool = False
        group_size: int = 1
        part_size: Optional[int] = None
        sample_per_part: int = 4
        trans_std: float = 0.0
        deform_fc_dim: int = 1024

        @_nn.compact
        def __call__(self, x: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
            P, D = self.pooled_size, self.output_dim
            kw = dict(spatial_scale=self.spatial_scale, pooled_size=P,
                      output_dim=D, group_size=self.group_size,
                      part_size=self.part_size,
                      sample_per_part=self.sample_per_part,
                      trans_std=self.trans_std)
            roi = deform_psroi_pool(x, rois, None, no_trans=True, **kw)
            if self.no_trans:
                return roi
            n = rois.shape[0]
            h = _nn.relu(_nn.Dense(self.deform_fc_dim,
                                   name='offset_mask_fc_0')(
                roi.reshape(n, -1)))
            h = _nn.relu(_nn.Dense(self.deform_fc_dim,
                                   name='offset_mask_fc_2')(h))
            h = _nn.Dense(P * P * 3, name='offset_mask_fc_4',
                          kernel_init=_nn.initializers.zeros,
                          bias_init=_nn.initializers.zeros)(h)
            h = h.reshape(n, 3, P, P)
            offset = h[:, :2]
            mask = jax.nn.sigmoid(h[:, 2:3])
            out = deform_psroi_pool(x, rois, offset, no_trans=False, **kw)
            return out * mask

    import jax  # noqa: E402  (used inside the module)
except Exception:  # pragma: no cover
    DeformRoIPooling = None
