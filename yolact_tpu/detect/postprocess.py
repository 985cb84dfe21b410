"""Post-processing: mask assembly + final output formatting.

Device half (:func:`postprocess_device`): prototype combination
``sigmoid(proto @ coeffs.T)`` + crop-by-box at prototype resolution — the
``proto @ masks.t()`` / crop path of the reference ``postprocess``
(``layers/output_utils.py:60-88``) as one fused fixed-shape XLA program
(matmul on the MXU, crop as an index-compare mask).

Host half (:func:`finish_masks`): per-image bilinear upsample to the original
(h, w) + 0.5 binarisation (``output_utils.py:91-99``), done with cv2 because
eval image sizes vary per image (dynamic shapes would defeat jit); the
benchmark/video path keeps everything on device at a fixed size instead via
:func:`upsample_masks_device`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolact_tpu.config import MaskType, YolactConfig
from yolact_tpu.detect.detection import Detections
from yolact_tpu.ops.boxes import crop, sanitize_coordinates


def postprocess_device(cfg: YolactConfig, dets: Detections,
                       crop_masks: bool = True,
                       score_threshold: float = 0.0,
                       use_pallas: bool = None):
    """Assemble instance masks at prototype resolution for padded detections.

    Returns (masks [B, D, Hp, Wp] sigmoid-activated & cropped, dets with
    score-threshold applied to `valid`).

    On TPU the standard sigmoid+crop path uses the fused Pallas kernel
    (kernels/mask_assembly.py — measured 3.1x over the XLA fusion on v5e);
    non-standard activations fall back to the XLA composition.
    """
    proto = dets.proto            # [B, Hp, Wp, Md]
    coeffs = dets.masks           # [B, D, Md]

    if not cfg.eval_mask_branch or \
            (proto is None and cfg.mask_type != MaskType.DIRECT):
        # box-only mode (--detect; reference eval.py:1068 sets
        # eval_mask_branch=False): the heads emit zero coeffs and no
        # prototypes — return zero 1x1 masks so the fixed-shape pipeline
        # and the evaluator keep working (the reference's own --detect
        # leaves raw coeffs in the mask slot and cannot compute mask mAP)
        B, D = coeffs.shape[:2]
        valid = dets.valid
        if score_threshold > 0:
            valid = valid & (dets.scores > score_threshold)
        return jnp.zeros((B, D, 1, 1), jnp.float32), \
            dets._replace(valid=valid)

    if cfg.mask_type == MaskType.DIRECT:
        # direct masks (mask_type=0): the head's mask output IS the mask —
        # mask_size^2 sigmoid values per detection, no prototype
        # combination and no crop (output_utils.py:101-120 upscales them
        # into the box on the host — finish_masks_direct)
        B, D = coeffs.shape[:2]
        S = cfg.mask_size
        masks = coeffs.reshape(B, D, S, S)
        valid = dets.valid
        if score_threshold > 0:
            valid = valid & (dets.scores > score_threshold)
        return masks, dets._replace(valid=valid)

    import os

    import jax.extend.backend
    on_tpu = jax.extend.backend.get_backend().platform == 'tpu'
    # YOLACT_TPU_FORCE_PALLAS_MASKS runs the real kernel body in Pallas
    # interpret mode off-TPU — lets the SPMD dryrun/tests execute the
    # pallas code path (not the XLA fallback) under sharded graphs.
    force = bool(os.environ.get('YOLACT_TPU_FORCE_PALLAS_MASKS'))
    if use_pallas is None:
        use_pallas = (force or
                      (on_tpu and
                       not os.environ.get('YOLACT_TPU_NO_PALLAS_MASKS')))
    use_pallas = (use_pallas and crop_masks and cfg.mask_proto_crop
                  and cfg.mask_proto_mask_activation == 'sigmoid')

    if use_pallas:
        from yolact_tpu.kernels.mask_assembly import assemble_masks_mapped
        masks = assemble_masks_mapped(proto, coeffs, dets.boxes,
                                      interpret=force and not on_tpu)
    else:
        def per_image(proto_i, coeffs_i, boxes_i):
            m = jnp.einsum('hwc,dc->hwd', proto_i, coeffs_i,
                           preferred_element_type=jnp.float32)
            if cfg.mask_proto_mask_activation == 'sigmoid':
                m = jax.nn.sigmoid(m)
            elif cfg.mask_proto_mask_activation == 'relu':
                m = jax.nn.relu(m)
            if crop_masks and cfg.mask_proto_crop:
                m = crop(m, boxes_i)
            return jnp.transpose(m, (2, 0, 1))   # [D, Hp, Wp]

        masks = jax.vmap(per_image)(proto, coeffs, dets.boxes)

    valid = dets.valid
    if score_threshold > 0:
        valid = valid & (dets.scores > score_threshold)
    return masks, dets._replace(valid=valid)


def select_class_maskiou(iou_p, classes):
    """[B, D, C-1] per-class maskiou -> [B, D] at each detection's class.
    Works on numpy or jax arrays — shared by the fast (device) and
    traditional (host) NMS paths."""
    xp = np if isinstance(iou_p, np.ndarray) else jnp
    cls = xp.clip(classes, 0, iou_p.shape[-1] - 1)
    return xp.take_along_axis(iou_p, cls[..., None], axis=-1)[..., 0]


def rescore_with_maskiou(cfg: YolactConfig, maskiou_apply, masks, dets):
    """YOLACT++ mask re-scoring (output_utils.py:79-88): run the maskiou net
    on assembled proto-res masks and multiply into the mask scores."""
    B, D, Hp, Wp = masks.shape
    flat = masks.reshape(B * D, Hp, Wp, 1)
    iou_p = maskiou_apply(flat)                     # [B*D, C-1]
    iou_p = iou_p.reshape(B, D, -1)
    return dets.scores * select_class_maskiou(iou_p, dets.classes)


def upsample_masks_device(masks: jnp.ndarray, size: Tuple[int, int],
                          binarize: bool = True) -> jnp.ndarray:
    """Fixed-size bilinear upsample + binarize on device ([B, D, h, w])."""
    B, D, Hp, Wp = masks.shape
    out = jax.image.resize(masks, (B, D, size[0], size[1]), method='linear')
    if binarize:
        out = (out > 0.5)
    return out


def sanitize_boxes_absolute(boxes: jnp.ndarray, w: int, h: int) -> jnp.ndarray:
    """Relative point-form boxes -> absolute integer pixel boxes
    (output_utils.py:97-99)."""
    x1, x2 = sanitize_coordinates(boxes[..., 0], boxes[..., 2], w, cast=False)
    y1, y2 = sanitize_coordinates(boxes[..., 1], boxes[..., 3], h, cast=False)
    return jnp.stack([x1, y1, x2, y2], axis=-1).astype(jnp.int32)


def finish_masks(masks_np: np.ndarray, w: int, h: int,
                 score_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Host: upsample proto-res masks [D, Hp, Wp] to [D, h, w] bool.

    Uses the torch-exact separable bilinear (ops/resize.py) — cv2
    INTER_LINEAR's fixed-point arithmetic flips ~4% of binarized pixels
    near the 0.5 threshold vs the reference's F.interpolate
    (output_utils.py:91-94); the matmul form matches it
    (tests/test_postprocess_oracle.py).
    """
    from yolact_tpu.ops.resize import resize_bilinear_torch_np
    masks_np = np.asarray(masks_np, np.float32)
    if score_mask is not None:
        masks_np = np.where(np.asarray(score_mask)[:, None, None],
                            masks_np, 0.0)
    if masks_np.shape[0] == 0:
        return np.zeros((0, h, w), dtype=bool)
    return resize_bilinear_torch_np(masks_np, (h, w)) > 0.5


def finish_masks_direct(masks_np: np.ndarray, boxes_abs: np.ndarray,
                        w: int, h: int) -> np.ndarray:
    """Host: upscale direct masks into their boxes (mask_type=0 branch of
    the reference postprocess, output_utils.py:101-120).

    ``masks_np`` [D, S, S] sigmoid mask patches, ``boxes_abs`` [D, 4]
    sanitized absolute integer boxes.  Each patch is bilinearly resized
    (align_corners=False, torch-exact) to its box size, binarized at 0.5,
    and pasted into a zero [h, w] canvas.  Degenerate boxes are skipped,
    matching the reference's in-place guard.
    """
    from yolact_tpu.ops.resize import resize_bilinear_torch_np
    masks_np = np.asarray(masks_np, np.float32)
    boxes_abs = np.asarray(boxes_abs)
    D = masks_np.shape[0]
    full = np.zeros((D, h, w), dtype=bool)
    for j in range(D):
        x1, y1, x2, y2 = (int(v) for v in boxes_abs[j])
        mask_w, mask_h = x2 - x1, y2 - y1
        if mask_w * mask_h <= 0 or mask_w < 0:
            continue
        patch = resize_bilinear_torch_np(masks_np[j:j + 1],
                                         (mask_h, mask_w))[0]
        full[j, y1:y2, x1:x2] = patch > 0.5
    return full
