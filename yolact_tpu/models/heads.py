"""Prediction head, prototype network, and mask-rescoring network.

Specs: reference ``yolact.py:47-212`` (PredictionModule), ``yolact.py:417-428``
(protonet via make_net), ``yolact.py:363-375`` (FastMaskIoUNet).

Weight sharing across pyramid levels (`share_prediction_module`) is expressed
the flax way: the caller instantiates one `PredictionHead` and applies it to
every level — linen reuses the same parameters for repeated calls of one
module instance, replacing the reference's `parent` pointer hack
(``yolact.py:624-626``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolact_tpu.config import MaskType, YolactConfig
from yolact_tpu.models.layers import Conv, SpecNet


def _activation(name: str):
    return {
        'tanh': jnp.tanh,
        'sigmoid': jax.nn.sigmoid,
        'relu': jax.nn.relu,
        'softmax': lambda x: jax.nn.softmax(x, axis=-1),
        'none': lambda x: x,
    }[name]


class ProtoNet(nn.Module):
    """Mask prototype network; returns NHWC prototypes after the prototype
    activation (relu), features-last for the coeff matmul."""
    cfg: YolactConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        if self.cfg.mask_proto_use_grid:
            # extra coordinate-grid input features (yolact.py:411-413,584-586)
            import os

            import numpy as np
            path = self.cfg.mask_proto_grid_file
            if not os.path.isabs(path) and not os.path.exists(path):
                # resolve relative to the repo root so grid configs work
                # from any CWD (the reference resolves vs CWD only)
                root = os.path.dirname(os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))))
                cand = os.path.join(root, path)
                if os.path.exists(cand):
                    path = cand
            grid = np.load(path)  # [g, h, w]
            if grid.shape[1:] != x.shape[1:3]:
                raise ValueError(
                    f'mask_proto_grid_file {path!r} has spatial shape '
                    f'{grid.shape[1:]} but the proto-net input convout is '
                    f'{tuple(x.shape[1:3])}; regenerate with '
                    f'scripts/make_grid.py --size '
                    f'{x.shape[1]},{x.shape[2]}')
            g = jnp.asarray(np.transpose(grid, (1, 2, 0)), x.dtype)
            g = jnp.broadcast_to(g[None], (x.shape[0],) + g.shape)
            x = jnp.concatenate([x, g], axis=-1)
        x = SpecNet(self.cfg.mask_proto_net, include_last_relu=False,
                    dtype=self.dtype, name='proto_net')(x)
        x = _activation(self.cfg.mask_proto_prototype_activation)(x)
        if self.cfg.mask_proto_bias:
            ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
            x = jnp.concatenate([x, ones], axis=-1)
        return x


class PredictionHead(nn.Module):
    """Multi-scale shared head producing (loc, conf, mask-coeff) per anchor."""
    cfg: YolactConfig
    num_priors: int  # anchors per spatial position (identical across levels)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, head_index: int = 0, train: bool = False):
        cfg = self.cfg
        num_classes = cfg.num_classes
        mask_dim = cfg.mask_dim
        if cfg.mask_proto_split_prototypes_by_head and \
                cfg.mask_type == MaskType.LINCOMB:
            mask_dim = mask_dim // cfg.num_heads

        if cfg.extra_head_net is not None:
            x = SpecNet(cfg.extra_head_net, include_last_relu=True,
                        dtype=self.dtype, name='upfeature')(x)

        if cfg.use_prediction_module:
            # DSSD (c) module (yolact.py:97-100,153-163): a bottleneck
            # branch plus a 1x1 conv + BN branch, summed.
            from yolact_tpu.models.resnet import Bottleneck
            a = Bottleneck(planes=x.shape[-1] // 4, stride=1,
                           has_downsample=False, dtype=self.dtype,
                           name='block')(x, train=train)
            b = Conv(x.shape[-1], 1, 1, 0, dtype=self.dtype,
                     name='pm_conv')(x)
            from yolact_tpu.models.layers import BatchNorm
            b = BatchNorm(dtype=self.dtype, name='pm_bn')(b, train)
            x = a + jax.nn.relu(b)

        hp = cfg.head_layer_params_dict
        k = hp.get('kernel_size', 3)
        p = hp.get('padding', 0)

        def extra(branch: str, n_layers: int, y):
            for i in range(n_layers):
                y = Conv(y.shape[-1], 3, 1, 1, dtype=self.dtype,
                         name=f'{branch}_extra_{2 * i}')(y)
                y = jax.nn.relu(y)
            return y

        bbox_x = extra('bbox', cfg.extra_layers[0], x)
        conf_x = extra('conf', cfg.extra_layers[1], x)
        mask_x = extra('mask', cfg.extra_layers[2], x)

        B = x.shape[0]
        bbox = Conv(self.num_priors * 4, k, 1, p, dtype=self.dtype,
                    name='bbox_layer')(bbox_x).reshape(B, -1, 4)
        if cfg.use_yolo_regressors:
            # squash xy to (-0.5, 0.5) cells then normalize by the conv
            # grid (yolact.py:185-188); decode() consumes this form
            conv_h, conv_w = x.shape[1], x.shape[2]
            xy = jax.nn.sigmoid(bbox[..., :2]) - 0.5
            xy = xy / jnp.asarray([conv_w, conv_h], xy.dtype)
            bbox = jnp.concatenate([xy, bbox[..., 2:]], axis=-1)
        conf = Conv(self.num_priors * num_classes, k, 1, p, dtype=self.dtype,
                    name='conf_layer')(conf_x).reshape(B, -1, num_classes)

        if cfg.eval_mask_branch:
            mask = Conv(self.num_priors * mask_dim, k, 1, p, dtype=self.dtype,
                        name='mask_layer')(mask_x).reshape(B, -1, mask_dim)
            if cfg.mask_type == MaskType.DIRECT:
                mask = jax.nn.sigmoid(mask)
            else:
                mask = _activation(cfg.mask_proto_coeff_activation)(mask)
                if cfg.mask_proto_coeff_gate:
                    gate = Conv(self.num_priors * mask_dim, 3, 1, 1,
                                dtype=self.dtype, name='gate_layer')(x)
                    mask = mask * jax.nn.sigmoid(
                        gate.reshape(B, -1, mask_dim))
        else:
            mask = jnp.zeros((B, bbox.shape[1], mask_dim), bbox.dtype)

        if cfg.mask_proto_split_prototypes_by_head and \
                cfg.mask_type == MaskType.LINCOMB:
            # Each head owns a slice of the prototype dim (yolact.py:199-200)
            pad_l = head_index * mask_dim
            pad_r = (cfg.num_heads - head_index - 1) * mask_dim
            mask = jnp.pad(mask, ((0, 0), (0, 0), (pad_l, pad_r)))

        out = {'loc': bbox, 'conf': conf, 'mask': mask}

        if cfg.use_mask_scoring:
            out['score'] = Conv(self.num_priors, k, 1, p, dtype=self.dtype,
                                name='score_layer')(x).reshape(B, -1, 1)
        if cfg.use_instance_coeff:
            out['inst'] = Conv(
                self.num_priors * cfg.num_instance_coeffs, k, 1, p,
                dtype=self.dtype, name='inst_layer')(x).reshape(
                    B, -1, cfg.num_instance_coeffs)
        return out


class FastMaskIoUNet(nn.Module):
    """Tiny convnet scoring assembled masks per class (YOLACT++;
    yolact.py:363-375).  Input [N, H, W, 1], output [N, num_classes-1]."""
    cfg: YolactConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        spec = tuple(self.cfg.maskiou_net) + \
            ((self.cfg.num_classes - 1, 1, ()),)
        x = SpecNet(spec, include_last_relu=True, dtype=self.dtype,
                    name='maskiou_net')(x)
        return jnp.max(x, axis=(1, 2))  # global max pool
