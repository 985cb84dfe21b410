"""SSD-style VGG-16 backbone.  Spec: reference ``backbone.py:324-444``.

The architecture comes in as the same nested tuple mini-language the
reference uses ('M' = max pool, int = conv channels, optionally paired with a
kwargs tuple), plus `extra_args` for the SSD add_layer stages and
`norm_layers` marking stages that get a BatchNorm applied to their output.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from flax import linen as nn

from yolact_tpu.models.layers import BatchNorm, Conv, max_pool


def _parse(v):
    if isinstance(v, tuple):
        return v[0], dict(v[1])
    return v, None


class VGGBackbone(nn.Module):
    arch: Tuple[Any, ...]
    extra_args: Tuple[Tuple[int, int], ...] = ()
    norm_layers: Tuple[int, ...] = ()
    num_stages: Optional[int] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for gi, group in enumerate(self.arch):
            li = 0
            for v in group:
                v, kw = _parse(v)
                if v == 'M':
                    kw = kw or {'kernel_size': 2, 'stride': 2}
                    x = max_pool(x, kw.get('kernel_size', 2),
                                 kw.get('stride', 2), kw.get('padding', 0),
                                 kw.get('ceil_mode', False))
                    li += 1
                else:
                    kw = kw or {'kernel_size': 3, 'padding': 1}
                    x = Conv(v, kw.get('kernel_size', 3),
                             kw.get('stride', 1), kw.get('padding', 0),
                             kw.get('dilation', 1), dtype=self.dtype,
                             name=f'layers_{gi}_{li}')(x)
                    x = jax.nn.relu(x)
                    li += 2  # torch Sequential counts the ReLU too
            if gi in self.norm_layers:
                x = BatchNorm(dtype=self.dtype,
                              name=f'norms_{self.norm_layers.index(gi)}')(x, train)
            outs.append(x)

        # SSD extra stages: 1x1 squeeze -> 3x3 stride-`ds` (backbone.py:421-440)
        n_extra = max(0, (self.num_stages or len(self.arch)) - len(self.arch))
        extras = list(self.extra_args) + [(128, 2)] * n_extra
        for ei in range(n_extra):
            ch, ds = extras[ei]
            pad = 1 if ds > 1 else 0
            gi = len(self.arch) + ei
            x = Conv(ch, 1, 1, 0, dtype=self.dtype, name=f'layers_{gi}_0')(x)
            x = jax.nn.relu(x)
            x = Conv(ch * 2, 3, ds, pad, dtype=self.dtype,
                     name=f'layers_{gi}_2')(x)
            x = jax.nn.relu(x)
            outs.append(x)
        return tuple(outs)
