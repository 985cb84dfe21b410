"""End-to-end inference pipeline: one jitted XLA program per batch shape.

The reference eval path hops between GPU kernels and Python
(``eval.py:932-975``): FastBaseTransform, forward, per-image Detect loops,
postprocess.  Here preprocess (resize + normalize + BGR->RGB,
``augmentations.py:616-658``), the conv trunk, softmax, fixed-shape
Fast-NMS, and prototype mask assembly all live in ONE jit so the only host
work per frame is JPEG decode and final mask upsampling.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolact_tpu.config import MEANS, STD, MaskType, YolactConfig
from yolact_tpu.detect.detection import detect
from yolact_tpu.detect.postprocess import (postprocess_device,
                                           rescore_with_maskiou)
from yolact_tpu.models.yolact import MaskIoUHead, Yolact


def preprocess_device(cfg: YolactConfig, img: jnp.ndarray) -> jnp.ndarray:
    """Device-side FastBaseTransform: [B, H, W, 3] BGR float [0,255] ->
    normalized RGB [B, S, S, 3] (augmentations.py:616-658)."""
    B = img.shape[0]
    img = img.astype(jnp.float32)
    if cfg.preserve_aspect_ratio:
        # area-preserving target (augmentations.py:131-137, FastBaseTransform)
        from yolact_tpu.data.augmentations import calc_size_preserve_ar
        tw, th = calc_size_preserve_ar(img.shape[2], img.shape[1],
                                       cfg.max_size)
        size = (th, tw)
    else:
        size = (cfg.max_size, cfg.max_size)
    if img.shape[1] != size[0] or img.shape[2] != size[1]:
        img = jax.image.resize(img, (B, size[0], size[1], 3), method='linear')
    t = cfg.backbone.transform
    mean = jnp.asarray(MEANS, jnp.float32)
    std = jnp.asarray(STD, jnp.float32)
    if t.normalize:
        img = (img - mean) / std
    elif t.subtract_means:
        img = img - mean
    elif t.to_float:
        img = img / 255.0
    # channel permutation AFTER the (BGR-space) normalisation, exactly as
    # BackboneTransform with in_channel_order='BGR'
    # (augmentations.py:580-594); 'RGB' yields the usual BGR->RGB flip,
    # any other order (e.g. BGR-trained VGG weights) works the same way
    perm = tuple('BGR'.index(c) for c in t.channel_order)
    return img[..., perm]


def preprocess_device_s2d(cfg: YolactConfig, img: jnp.ndarray) -> jnp.ndarray:
    """Space-to-depth variant of :func:`preprocess_device` for
    ``cfg.stem_s2d``: [B, H, W, 3] BGR float [0,255] -> normalized 2x2
    space-to-depth [B, S/2, S/2, 12], still in BGR order (the stem conv
    folds the channel flip into its kernel — models/layers.py:Conv).
    Every full-image elementwise op then runs with 12 channels on the
    128-lane axis instead of 3, 4x less lane padding."""
    # guard the preconditions maybe_enable_stem_s2d checks — a FORCED
    # --stem_s2d on an unsupported config must error, not silently drop
    # the last row/column (odd size) or squash aspect-preserving inputs
    if cfg.max_size % 2:
        raise ValueError(f'stem_s2d needs an even max_size, '
                         f'got {cfg.max_size}')
    if cfg.preserve_aspect_ratio:
        raise ValueError('stem_s2d does not support preserve_aspect_ratio')
    B = img.shape[0]
    S = cfg.max_size
    img = img.astype(jnp.float32)
    if img.shape[1] != S or img.shape[2] != S:
        img = jax.image.resize(img, (B, S, S, 3), method='linear')

    # The rearrange runs as a stride-2 conv with a one-hot kernel (the MXU
    # shuffles the data); a reshape+transpose formulation materializes a
    # 6-D copy that costs ~2.5 ms/frame at batch 1.  The channel scale of
    # the normalization folds into the kernel, the shift applies after
    # (fuses into the conv epilogue).
    t = cfg.backbone.transform
    mean = jnp.tile(jnp.asarray(MEANS, jnp.float32), 4)
    std = jnp.tile(jnp.asarray(STD, jnp.float32), 4)
    from yolact_tpu.models.layers import s2d_eye_kernel
    eye = jnp.asarray(s2d_eye_kernel(3))          # ch = (p*2+q)*3+c
    if t.normalize:
        kernel, shift = eye / std, mean / std
    elif t.subtract_means:
        kernel, shift = eye, mean
    elif t.to_float:
        kernel, shift = eye / 255.0, jnp.zeros(12)
    else:
        kernel, shift = eye, jnp.zeros(12)
    x = jax.lax.conv_general_dilated(
        img, kernel, (2, 2), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return x - shift


def maybe_enable_stem_s2d(cfg: YolactConfig) -> YolactConfig:
    """Turn on the space-to-depth stem when the config supports it
    (ResNet backbone, square even input, RGB transform).  Only valid for
    pipelines that run :func:`preprocess_device_s2d` on raw images."""
    if (cfg.backbone.type in ('resnet', 'resnet_gn')
            and not cfg.preserve_aspect_ratio
            and cfg.max_size % 2 == 0
            and cfg.mask_proto_src is not None
            and cfg.backbone.transform.channel_order == 'RGB'):
        return cfg.copy(stem_s2d=True)
    return cfg


class InferenceOutput(NamedTuple):
    boxes: jnp.ndarray       # [B, D, 4] relative point form
    classes: jnp.ndarray     # [B, D] int32 (0-based foreground)
    scores: jnp.ndarray      # [B, D]
    masks: jnp.ndarray       # [B, D, Hp, Wp] proto-res sigmoid masks (cropped)
    valid: jnp.ndarray       # [B, D] bool
    mask_scores: Optional[jnp.ndarray] = None  # [B, D] maskiou-rescored


def _prepare_input(cfg: YolactConfig, images: jnp.ndarray,
                   preprocess: bool) -> jnp.ndarray:
    """Shared input preparation for the device programs: raw images get
    the device FastBaseTransform (s2d-fused when cfg.stem_s2d); already
    host-preprocessed (normalized RGB) input is space-to-depth'd on
    device when the s2d stem is active (exact; models/layers.py:s2d_input).
    ONE place owns the s2d dispatch rule so the fast-NMS and traditional
    pipelines cannot drift."""
    if preprocess:
        return preprocess_device_s2d(cfg, images) if cfg.stem_s2d \
            else preprocess_device(cfg, images)
    if cfg.stem_s2d:
        from yolact_tpu.models.layers import s2d_input
        return s2d_input(images, from_rgb=True)
    return images


def forward_and_detect(cfg: YolactConfig, model: Yolact, variables: Dict,
                       images: jnp.ndarray, preprocess: bool = True,
                       maskiou_variables: Optional[Dict] = None,
                       use_fast_nms: bool = True,
                       use_cross_class_nms: bool = False,
                       score_threshold: float = 0.0,
                       crop_masks: bool = True) -> InferenceOutput:
    """The full device program (jit me)."""
    if not use_fast_nms:
        # the greedy traditional NMS is host-side by design (sequential);
        # silently running fast-NMS here would misreport benchmarks/mAP
        raise NotImplementedError(
            'use_fast_nms=False is the host traditional-NMS path: use '
            'forward_raw + eval.traditional.traditional_nms (see '
            'eval/evaluate.py), not forward_and_detect')
    x = _prepare_input(cfg, images, preprocess)
    preds = model.apply(variables, x, train=False)
    dets = detect(cfg, preds, use_fast_nms=use_fast_nms,
                  use_cross_class_nms=use_cross_class_nms)
    masks, dets = postprocess_device(cfg, dets, crop_masks=crop_masks,
                                     score_threshold=score_threshold)
    mask_scores = None
    if (cfg.use_maskiou and maskiou_variables is not None
            and cfg.mask_type != MaskType.DIRECT and cfg.eval_mask_branch):
        miou = MaskIoUHead(cfg)
        mask_scores = rescore_with_maskiou(
            cfg, lambda m: miou.apply(maskiou_variables, m), masks, dets)
    return InferenceOutput(dets.boxes, dets.classes, dets.scores, masks,
                           dets.valid, mask_scores)


def forward_raw(cfg: YolactConfig, model: Yolact, variables: Dict,
                images: jnp.ndarray, preprocess: bool = True):
    """Device program for the host (traditional) NMS path: returns
    (decoded boxes [B,P,4], fg scores [B,C-1,P], coeffs, proto).

    Scores use the same eval-branch transform as :func:`detect`
    (focal/objectness/mask-scoring aware); ``proto`` is None for
    direct-mask configs (mask_type=0), whose 'mask' field already holds
    flattened sigmoid mask patches."""
    from yolact_tpu.detect.detection import eval_scores
    from yolact_tpu.ops.boxes import decode
    x = _prepare_input(cfg, images, preprocess)
    preds = model.apply(variables, x, train=False)
    conf = eval_scores(cfg, preds)
    scores = jnp.swapaxes(conf[..., 1:], 1, 2)
    boxes = decode(preds['loc'].astype(jnp.float32),
                   preds['priors'].astype(jnp.float32)[None],
                   cfg.use_yolo_regressors)
    proto = preds['proto'].astype(jnp.float32) if 'proto' in preds else None
    return boxes, scores, preds['mask'].astype(jnp.float32), proto


class Pipeline:
    """Convenience wrapper owning a jitted program per batch size."""

    def __init__(self, cfg: YolactConfig, variables: Dict,
                 maskiou_variables: Optional[Dict] = None,
                 use_fast_nms: bool = True,
                 use_cross_class_nms: bool = False,
                 preprocess: bool = True,
                 score_threshold: float = 0.0,
                 crop_masks: bool = True):
        if preprocess:
            # raw-image pipelines get the space-to-depth stem for free
            # (same params; see maybe_enable_stem_s2d)
            cfg = maybe_enable_stem_s2d(cfg)
        self.cfg = cfg
        self.model = Yolact(cfg)
        self.variables = variables
        self.maskiou_variables = maskiou_variables
        self._fn = jax.jit(partial(
            forward_and_detect, cfg, self.model,
            preprocess=preprocess,
            use_fast_nms=use_fast_nms,
            use_cross_class_nms=use_cross_class_nms,
            score_threshold=score_threshold,
            crop_masks=crop_masks))

    def __call__(self, images) -> InferenceOutput:
        return self._fn(self.variables, images=jnp.asarray(images),
                        maskiou_variables=self.maskiou_variables)


def random_variables(cfg: YolactConfig, seed: int = 0):
    model = Yolact(cfg)
    S = cfg.max_size
    shape = (1, S // 2, S // 2, 12) if cfg.stem_s2d else (1, S, S, 3)
    dummy = jnp.zeros(shape, jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy, train=False)
