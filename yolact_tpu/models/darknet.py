"""DarkNet-53 backbone (YOLOv3).  Spec: reference ``backbone.py:222-318``.

conv -> BN -> LeakyReLU(0.1) blocks; each stage opens with a stride-2 conv
followed by `n` residual (1x1 squeeze, 3x3 expand) blocks.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from flax import linen as nn

from yolact_tpu.models.layers import BatchNorm, Conv


class DarkConv(nn.Module):
    """conv(bias=False) + BN + LeakyReLU(0.1).  Ref: backbone.py:222-233."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, self.kernel_size, self.stride, self.padding,
                 use_bias=False, dtype=self.dtype, name='conv')(x)
        x = BatchNorm(dtype=self.dtype, name='bn')(x, train)
        return jax.nn.leaky_relu(x, negative_slope=0.1)


class DarkBlock(nn.Module):
    """Residual 1x1 -> 3x3 block, expansion 2.  Ref: backbone.py:235-247."""
    channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = DarkConv(self.channels, 1, 1, 0, dtype=self.dtype,
                       name='conv1')(x, train)
        out = DarkConv(self.channels * 2, 3, 1, 1, dtype=self.dtype,
                       name='conv2')(out, train)
        return out + x


class DarkNetBackbone(nn.Module):
    layers: Tuple[int, ...] = (1, 2, 8, 8, 4)
    num_stages: Optional[int] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DarkConv(32, 3, 1, 1, dtype=self.dtype, name='preconv')(x, train)

        extra = max(0, (self.num_stages or len(self.layers)) - len(self.layers))
        base_channels = (32, 64, 128, 256, 512)
        channels = base_channels[:len(self.layers)] + (512,) * extra
        blocks = tuple(self.layers) + (1,) * extra

        outs = []
        for si, (ch, n) in enumerate(zip(channels, blocks)):
            x = DarkConv(ch * 2, 3, 2, 1, dtype=self.dtype,
                         name=f'layers_{si}_0')(x, train)
            for bi in range(n):
                x = DarkBlock(ch, dtype=self.dtype,
                              name=f'layers_{si}_{bi + 1}')(x, train)
            outs.append(x)
        return tuple(outs)
