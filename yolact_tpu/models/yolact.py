"""Top-level YOLACT model: backbone -> FPN -> (protonet ‖ heads).

Functional equivalent of the reference ``Yolact`` module
(``yolact.py:379-676``) re-designed for XLA: static wiring decided entirely by
the config at construction, NHWC layout, fixed shapes, no runtime config
mutation.  The eval-branch score transform + detection live in
``yolact_tpu.detect`` as pure functions rather than inside forward.

Input is NHWC float32/bf16, already preprocessed (see data/transforms).
Output dict (train mode):
  loc    [B, P, 4]      raw box regressions
  conf   [B, P, C]      raw class logits
  mask   [B, P, 32]     tanh mask coefficients
  priors [P, 4]         center-size anchors (constant)
  proto  [B, 138, 138, 32]  prototypes (relu)
  segm   [B, C-1, Hs, Ws]   semantic-seg aux logits (train only)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolact_tpu.config import MaskType, YolactConfig
from yolact_tpu.models.darknet import DarkNetBackbone
from yolact_tpu.models.fpn import FPN
from yolact_tpu.models.heads import FastMaskIoUNet, PredictionHead, ProtoNet
from yolact_tpu.models.layers import Conv
from yolact_tpu.models.resnet import ResNetBackbone
from yolact_tpu.models.vgg import VGGBackbone
from yolact_tpu.ops.anchors import generate_priors


def _build_backbone(cfg: YolactConfig, dtype):
    bb = cfg.backbone
    num_stages = max(bb.selected_layers) + 1
    if bb.type in ('resnet', 'resnet_gn'):
        layers = tuple(bb.args[0])
        dcn_layers = tuple(bb.args[1]) if len(bb.args) > 1 else (0, 0, 0, 0)
        dcn_interval = bb.args[2] if len(bb.args) > 2 else 1
        atrous = tuple(bb.args[3]) if len(bb.args) > 3 else ()
        return ResNetBackbone(
            layers=layers, dcn_layers=dcn_layers, dcn_interval=dcn_interval,
            atrous_layers=atrous,
            num_stages=max(num_stages, len(layers)),
            norm='gn' if bb.type == 'resnet_gn' else 'bn',
            stem_s2d=cfg.stem_s2d,
            train_remat=cfg.train_remat,
            dtype=dtype, name='backbone')
    if cfg.stem_s2d:
        raise ValueError('stem_s2d is only supported for ResNet backbones')
    if bb.type == 'darknet':
        layers = tuple(bb.args[0])
        return DarkNetBackbone(layers=layers,
                               num_stages=max(num_stages, len(layers)),
                               dtype=dtype, name='backbone')
    if bb.type == 'vgg':
        arch, extra_args, norm_layers = bb.args
        return VGGBackbone(arch=arch, extra_args=extra_args,
                           norm_layers=tuple(norm_layers),
                           num_stages=max(num_stages, len(arch)),
                           dtype=dtype, name='backbone')
    raise ValueError(bb.type)


class Yolact(nn.Module):
    cfg: YolactConfig

    @property
    def dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        dtype = self.dtype
        x = x.astype(dtype)

        # freeze_bn (yolact.py:555-562): BN stays in eval mode during
        # training; only the backbone carries BN/GN layers.
        bn_train = train and not cfg.freeze_bn
        outs = _build_backbone(cfg, dtype)(x, bn_train)

        if cfg.fpn is not None:
            selected = tuple(outs[i] for i in cfg.backbone.selected_layers)
            outs = FPN(cfg.fpn, dtype=dtype, name='fpn')(selected)
        else:
            outs = tuple(outs[i] for i in cfg.backbone.selected_layers)

        proto_out = None
        if cfg.mask_type == MaskType.LINCOMB and cfg.eval_mask_branch:
            if cfg.mask_proto_src is None and cfg.stem_s2d:
                raise ValueError('stem_s2d cannot feed the protonet the '
                                 'raw image (mask_proto_src=None)')
            proto_x = x if cfg.mask_proto_src is None else outs[cfg.mask_proto_src]
            proto_out = ProtoNet(cfg, dtype=dtype, name='proto')(proto_x)

        # One head instance; repeated application shares parameters when
        # share_prediction_module is set, otherwise one instance per level.
        num_priors_per_pos = sum(
            len(ars) * len(cfg.backbone.pred_scales[0])
            for ars in cfg.backbone.pred_aspect_ratios[0])

        # prototypes-as-features (yolact.py:591-622): the activated
        # pre-bias prototypes are bilinearly rescaled to each head level
        # and concatenated to its input.  NOTE the reference resizes the
        # PREVIOUSLY-resized tensor at every level (progressive
        # downsampling chain), reproduced here for parity.
        proto_feat = None
        if (cfg.mask_type == MaskType.LINCOMB
                and cfg.mask_proto_prototypes_as_features):
            if proto_out is None:
                raise ValueError('mask_proto_prototypes_as_features needs '
                                 'the lincomb mask branch enabled')
            proto_feat = proto_out[..., :-1] if cfg.mask_proto_bias \
                else proto_out
            if cfg.mask_proto_prototypes_as_features_no_grad:
                proto_feat = jax.lax.stop_gradient(proto_feat)

        preds = []
        shared_head = None
        for idx in range(len(outs)):
            if cfg.share_prediction_module:
                if shared_head is None:
                    shared_head = PredictionHead(
                        cfg, num_priors_per_pos, dtype=dtype,
                        name='prediction_layers_0')
                head = shared_head
            else:
                n_p = sum(len(ars) * len(cfg.backbone.pred_scales[idx])
                          for ars in cfg.backbone.pred_aspect_ratios[idx])
                head = PredictionHead(cfg, n_p, dtype=dtype,
                                      name=f'prediction_layers_{idx}')
            head_x = outs[idx]
            if proto_feat is not None:
                # torch-exact non-antialiased bilinear (F.interpolate);
                # jax.image.resize antialiases on downscale
                from yolact_tpu.ops.resize import resize_bilinear_torch
                pf = jnp.transpose(proto_feat, (0, 3, 1, 2))
                pf = resize_bilinear_torch(pf, head_x.shape[1:3])
                proto_feat = jnp.transpose(pf, (0, 2, 3, 1)).astype(dtype)
                head_x = jnp.concatenate([head_x, proto_feat], axis=-1)
            preds.append(head(head_x, head_index=idx, train=bn_train))

        pred_outs: Dict[str, Any] = {
            k: jnp.concatenate([p[k] for p in preds], axis=1)
            for k in preds[0]}

        # logical image size: a space-to-depth input is at half resolution
        scale = 2 if cfg.stem_s2d else 1
        pred_outs['priors'] = jnp.asarray(
            generate_priors(cfg, (x.shape[1] * scale, x.shape[2] * scale)),
            jnp.float32)

        if proto_out is not None:
            pred_outs['proto'] = proto_out

        if train:
            if cfg.use_class_existence_loss:
                feat = outs[-1].mean(axis=(1, 2))
                pred_outs['classes'] = nn.Dense(
                    cfg.num_classes - 1, dtype=dtype,
                    name='class_existence_fc')(feat)
            if cfg.use_semantic_segmentation_loss:
                pred_outs['segm'] = Conv(
                    cfg.num_classes - 1, 1, 1, 0, dtype=dtype,
                    name='semantic_seg_conv')(outs[0])
        return pred_outs


class MaskIoUHead(nn.Module):
    """Standalone maskiou net so eval can apply it to assembled masks
    (postprocess path, output_utils.py:79-88)."""
    cfg: YolactConfig

    @nn.compact
    def __call__(self, masks):
        return FastMaskIoUNet(self.cfg, name='maskiou')(masks)


def make_model(cfg: YolactConfig) -> Yolact:
    return Yolact(cfg)


def init_params(cfg: YolactConfig, seed: int = 0, img_size: Optional[int] = None,
                train: bool = True):
    """Initialise model variables with a dummy batch (shape-only trace)."""
    model = Yolact(cfg)
    size = img_size or cfg.max_size
    # s2d stems consume a 2x2 space-to-depth input at half resolution
    # (matches train/step.py:create_train_state and infer.Pipeline)
    dummy = jnp.zeros((1, size // 2, size // 2, 12) if cfg.stem_s2d
                      else (1, size, size, 3), jnp.float32)
    return model, model.init(jax.random.PRNGKey(seed), dummy, train=train)


if __name__ == '__main__':
    # Module smoke test (parity with the reference's yolact.py __main__,
    # yolact.py:682-724): build the net, run a zero batch, print output
    # shapes/sums, then loop for an fps estimate.
    import sys
    import time

    from yolact_tpu.config import get_config

    name = sys.argv[1] if len(sys.argv) > 1 else 'yolact_base'
    cfg = get_config(name)
    model, variables = init_params(cfg, train=True)
    S = cfg.max_size
    # stem_s2d models consume 2x2 space-to-depth input (12 channels)
    x = jnp.zeros((1, S // 2, S // 2, 12) if cfg.stem_s2d
                  else (1, S, S, 3), jnp.float32)
    y, _ = model.apply(variables, x, train=True, mutable=['batch_stats'])

    for k, a in y.items():
        print(f'{k}: {tuple(a.shape)} sum={float(jnp.sum(a.astype(jnp.float32))):.4f}')

    fwd = jax.jit(lambda v, xx: model.apply(v, xx))
    jax.block_until_ready(fwd(variables, x))
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        out = fwd(variables, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f'\nAvg fps: {1 / dt:.2f}\tAvg ms: {dt * 1000:.2f} '
          f'(async-pipelined; see bench.py for the strict serial number)')
