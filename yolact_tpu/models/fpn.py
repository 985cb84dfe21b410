"""Feature Pyramid Network.  Spec: reference ``yolact.py:265-361``.

1x1 lateral convs + bilinear top-down accumulation, 3x3 pred convs (+ReLU),
then either stride-2 3x3 downsample convs (P6, P7) or stride-2 max pooling.
The reference stores lateral convs reversed for checkpoint compatibility —
here `lat_convs_{i}` is applied to level ``len-1-i``, mirroring that order so
the weight converter maps names directly.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolact_tpu.config import FPNConfig
from yolact_tpu.models.layers import Conv, resize_bilinear


class FPN(nn.Module):
    cfg: FPNConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, convouts: Tuple[jnp.ndarray, ...]):
        fc = self.cfg
        n = len(convouts)
        out: List[Optional[jnp.ndarray]] = [None] * n

        # Top-down pathway; lat conv i consumes level n-1-i (stored reversed
        # in the reference checkpoint, yolact.py:286-289).
        x = None
        for i in range(n):
            j = n - 1 - i
            lat = Conv(fc.num_features, 1, 1, 0, dtype=self.dtype,
                       name=f'lat_layers_{i}')(convouts[j])
            if x is not None:
                h, w = convouts[j].shape[1], convouts[j].shape[2]
                # cfg.fpn.interpolation_mode is what the reference passes
                # to F.interpolate (yolact.py:332)
                if fc.interpolation_mode == 'bilinear':
                    x = resize_bilinear(x, (h, w)) + lat
                elif fc.interpolation_mode == 'nearest':
                    # torch F.interpolate 'nearest' picks
                    # src = floor(dst * in/out) (asymmetric, NOT
                    # half-pixel like jax.image.resize's 'nearest')
                    rows = jnp.floor(jnp.arange(h) *
                                     (x.shape[1] / h)).astype(jnp.int32)
                    cols = jnp.floor(jnp.arange(w) *
                                     (x.shape[2] / w)).astype(jnp.int32)
                    x = x[:, rows][:, :, cols] + lat
                else:
                    raise NotImplementedError(
                        f'fpn.interpolation_mode='
                        f'{fc.interpolation_mode!r}')
            else:
                x = lat
            out[j] = x

        pad = 1 if fc.pad else 0
        for i in range(n):
            j = n - 1 - i
            y = Conv(fc.num_features, 3, 1, pad, dtype=self.dtype,
                     name=f'pred_layers_{i}')(out[j])
            if fc.relu_pred_layers:
                y = jax.nn.relu(y)
            out[j] = y

        cur = len(out)
        if fc.use_conv_downsample:
            for i in range(fc.num_downsample):
                out.append(Conv(fc.num_features, 3, 2, 1, dtype=self.dtype,
                                name=f'downsample_layers_{i}')(out[-1]))
        else:
            for _ in range(fc.num_downsample):
                out.append(out[-1][:, ::2, ::2, :])

        if fc.relu_downsample_layers:
            # reference quirk (yolact.py:357-359): the relu'd DOWNSAMPLE
            # outputs overwrite pyramid slots 0..num_downsample-1 —
            # out[idx] = relu(out[idx + cur_idx]).  Clearly unintended
            # upstream (and unused by every shipped config), reproduced
            # op-for-op like the other bug-compat flags
            for i in range(len(out) - cur):
                out[i] = jax.nn.relu(out[cur + i])

        return tuple(out)
