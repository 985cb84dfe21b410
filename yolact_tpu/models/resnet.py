"""ResNet-50/101 backbone (bottleneck blocks), with optional DCNv2 stages,
atrous (dilated) stages, and SSD-style `add_layer` growth.

Behavioural spec comes from the reference ``backbone.py:13-158`` (its own
adaptation of torchvision resnet); the implementation here is NHWC flax with
static module wiring so XLA sees one flat conv graph.

DCN placement rule (backbone.py:112-118): within a stage of ``blocks`` blocks
and a budget of ``dcn_layers``, block 0 uses DCN iff dcn_layers >= blocks, and
block i>0 uses DCN iff (i + dcn_layers) >= blocks and i % dcn_interval == 0.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolact_tpu.kernels.dcn import deform_conv2d
from yolact_tpu.models.layers import BatchNorm, Conv, GroupNorm, max_pool

EXPANSION = 4


class DCNLayer(nn.Module):
    """DCNv2 layer: a zero-init conv predicts per-tap offsets + modulation
    mask, then the deformable conv consumes them (reference
    ``external/DCNv2/dcn_v2.py:97-128``).

    The deformable gather runs through the XLA formulation in
    ``kernels/dcn.py`` — on this TPU stack that IS the fast path.  A fused
    VMEM-resident Pallas kernel was built and buried in round 4: Mosaic's
    only scattered-read primitive (``tpu.dynamic_gather``) is a vreg-local
    shuffle (gather-dim extent <= one vreg), so gathering bilinear corners
    from a whole feature slab cannot lower, full stop.  Evidence:
    ``scripts/probe_sameshape_gather.py`` + ``results/dcn_pallas_r4.txt``;
    write-up in PERF.md "DCN anatomy"."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        # weight AND bias start at zero (dcn_v2.py:114-116 init_offset) so
        # the DCN begins as a plain conv (offsets 0, mask sigmoid(0)=0.5);
        # xavier-random offsets destabilize from-scratch training (measured:
        # yolact_plus 550^2 b8 explodes by step 2 without this)
        om = Conv(features=3 * k * k, kernel_size=k, stride=self.stride,
                  padding=self.padding, dilation=self.dilation,
                  use_bias=True, dtype=self.dtype,
                  kernel_init=nn.initializers.zeros,
                  name='conv_offset_mask')(x)
        offset = om[..., :2 * k * k]
        mask = jax.nn.sigmoid(om[..., 2 * k * k:])
        weight = self.param(
            'weight', nn.initializers.kaiming_normal(),
            (k, k, x.shape[-1], self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return deform_conv2d(
            x.astype(self.dtype or x.dtype), offset.astype(jnp.float32),
            mask, weight.astype(self.dtype or weight.dtype), bias,
            stride=self.stride, padding=self.padding, dilation=self.dilation)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (stride / DCN) -> 1x1 with identity/projection residual.
    Ref: backbone.py:13-57."""
    planes: int
    stride: int = 1
    dilation: int = 1
    use_dcn: bool = False
    has_downsample: bool = False
    norm: str = 'bn'
    dtype: Optional[Any] = None

    def _norm(self, name):
        if self.norm == 'gn':
            return GroupNorm(dtype=self.dtype, name=name)
        return BatchNorm(dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = Conv(self.planes, 1, 1, 0, dilation=self.dilation,
                   use_bias=False, dtype=self.dtype, name='conv1')(x)
        out = self._norm('bn1')(out, train)
        out = jax.nn.relu(out)

        if self.use_dcn:
            out = DCNLayer(self.planes, 3, self.stride, self.dilation,
                           self.dilation, dtype=self.dtype,
                           name='conv2')(out, train)
        else:
            out = Conv(self.planes, 3, self.stride, self.dilation,
                       dilation=self.dilation, use_bias=False,
                       dtype=self.dtype, name='conv2')(out)
        out = self._norm('bn2')(out, train)
        out = jax.nn.relu(out)

        out = Conv(self.planes * EXPANSION, 1, 1, 0, dilation=self.dilation,
                   use_bias=False, dtype=self.dtype, name='conv3')(out)
        out = self._norm('bn3')(out, train)

        if self.has_downsample:
            residual = Conv(self.planes * EXPANSION, 1, self.stride, 0,
                            dilation=self.dilation, use_bias=False,
                            dtype=self.dtype, name='downsample_conv')(x)
            residual = self._norm('downsample_bn')(residual, train)

        return jax.nn.relu(out + residual)


def _stage_plan(layers: Sequence[int],
                dcn_layers: Sequence[int],
                dcn_interval: int,
                atrous_layers: Sequence[int],
                extra_stages: int) -> Tuple[Tuple[dict, ...], ...]:
    """Static plan of all bottleneck blocks: mirrors _make_layer bookkeeping
    (backbone.py:96-124) including dilation accumulation for atrous stages."""
    plans = []
    inplanes = 64
    dilation = 1
    base_planes = [64, 128, 256, 512]
    all_planes = base_planes + [1024 // EXPANSION] * extra_stages
    all_blocks = list(layers) + [1] * extra_stages
    all_dcn = list(dcn_layers) + [0] * (len(all_blocks) - len(dcn_layers))

    for stage_idx, (planes, blocks) in enumerate(zip(all_planes, all_blocks)):
        stride = 1 if stage_idx == 0 else 2
        dcn_budget = all_dcn[stage_idx]
        stage = []
        has_ds = stride != 1 or inplanes != planes * EXPANSION
        if has_ds and stage_idx in atrous_layers:
            dilation += 1
            stride = 1
        use_dcn0 = dcn_budget >= blocks
        stage.append(dict(planes=planes, stride=stride, dilation=dilation,
                          use_dcn=use_dcn0, has_downsample=has_ds))
        inplanes = planes * EXPANSION
        for i in range(1, blocks):
            use_dcn = ((i + dcn_budget) >= blocks) and (i % dcn_interval == 0)
            # the reference passes the accumulated dilation ONLY to block 0
            # (backbone.py:114 vs :118 — blocks i>0 use the Bottleneck
            # default dilation=1); reproduced for checkpoint parity
            stage.append(dict(planes=planes, stride=1, dilation=1,
                              use_dcn=use_dcn, has_downsample=False))
        plans.append(tuple(stage))
    return tuple(plans)


class ResNetBackbone(nn.Module):
    """Returns one feature map per stage (C2..C5 [+extras])."""
    layers: Tuple[int, ...]
    dcn_layers: Tuple[int, ...] = (0, 0, 0, 0)
    dcn_interval: int = 1
    atrous_layers: Tuple[int, ...] = ()
    num_stages: Optional[int] = None  # >4 adds SSD extra stages
    norm: str = 'bn'
    dtype: Optional[Any] = None
    stem_s2d: bool = False  # input is 2x2 space-to-depth (see layers.Conv)
    # 'none' | 'dcn' | 'all': wrap bottleneck blocks in jax.checkpoint
    # during TRAINING so their intermediates (the DCN corner-block gather
    # and im2col tensors especially) are recomputed in the backward pass
    # instead of held in HBM (cfg.train_remat; config.py has the numbers)
    train_remat: str = 'none'

    @nn.compact
    def __call__(self, x, train: bool = False):
        extra = max(0, (self.num_stages or len(self.layers)) - len(self.layers))
        plans = _stage_plan(self.layers, self.dcn_layers, self.dcn_interval,
                            self.atrous_layers, extra)

        x = Conv(64, 7, 2, 3, use_bias=False, dtype=self.dtype,
                 stem_s2d=self.stem_s2d, name='conv1')(x)
        if self.norm == 'gn':
            x = GroupNorm(dtype=self.dtype, name='bn1')(x, train)
        else:
            x = BatchNorm(dtype=self.dtype, name='bn1')(x, train)
        x = jax.nn.relu(x)
        x = max_pool(x, 3, 2, 1)

        if self.train_remat not in ('none', 'dcn', 'all'):
            raise ValueError(
                f'train_remat={self.train_remat!r}: expected one of '
                f"'none', 'dcn', 'all' (a typo here silently disables the "
                f'HBM relief the knob exists for)')
        outs = []
        for si, stage in enumerate(plans):
            for bi, blk in enumerate(stage):
                cls = Bottleneck
                if train and (self.train_remat == 'all' or
                              (self.train_remat == 'dcn' and blk['use_dcn'])):
                    # identical param tree and forward math; only the
                    # autodiff residual policy changes
                    cls = nn.remat(Bottleneck, static_argnums=(2,))
                x = cls(norm=self.norm, dtype=self.dtype,
                        name=f'layers_{si}_{bi}', **blk)(x, train)
            outs.append(x)
        return tuple(outs)
