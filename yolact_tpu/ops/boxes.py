"""Box/mask geometry ops as pure JAX functions.

Functional equivalents of ``/root/reference/layers/box_utils.py`` designed for
XLA: everything is fixed-shape, broadcast-based (no ``.expand`` copies), and
safe to ``vmap``/``jit``.  Padded inputs are handled by masking at the call
sites; these primitives never branch on data.

Boxes are ``[..., 4]`` in either point form ``(x1, y1, x2, y2)`` or
center-size form ``(cx, cy, w, h)``, relative [0, 1] coordinates unless noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# SSD encode/decode variances (box_utils.py:262, :315)
VARIANCES = (0.1, 0.2)


def point_form(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2).  Ref: box_utils.py:8-17."""
    xy, wh = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)


def center_size(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h).  Ref: box_utils.py:20-30."""
    lo, hi = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([(hi + lo) / 2, hi - lo], axis=-1)


def intersect(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection area.

    box_a: [..., A, 4], box_b: [..., B, 4] (point form) -> [..., A, B].
    Ref: box_utils.py:32-52.
    """
    # x and y handled as separate [..., A, B] planes: a stacked
    # [..., A, B, 2] intermediate puts 2 elements on the 128-lane axis
    # (profiled 64x lane waste in the NMS IoU matrix)
    w = jnp.clip(
        jnp.minimum(box_a[..., :, None, 2], box_b[..., None, :, 2])
        - jnp.maximum(box_a[..., :, None, 0], box_b[..., None, :, 0]),
        min=0)
    h = jnp.clip(
        jnp.minimum(box_a[..., :, None, 3], box_b[..., None, :, 3])
        - jnp.maximum(box_a[..., :, None, 1], box_b[..., None, :, 1]),
        min=0)
    return w * h


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def jaccard(box_a: jnp.ndarray, box_b: jnp.ndarray,
            iscrowd: bool = False) -> jnp.ndarray:
    """Pairwise IoU [..., A, B]; crowd mode divides by area(a) only.

    Ref: box_utils.py:54-81.  Division follows torch semantics (0/0 = nan)
    only where it cannot occur for valid boxes; padded zero-area rows yield 0
    because we guard the denominator.
    """
    inter = intersect(box_a, box_b)
    area_a = area(box_a)[..., :, None]
    area_b = area(box_b)[..., None, :]
    denom = area_a if iscrowd else area_a + area_b - inter
    return jnp.where(denom > 0, inter / jnp.where(denom > 0, denom, 1), 0.0)


def elemwise_box_iou(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """IoU between aligned boxes [n, 4] x [n, 4] -> [n].
    Ref: box_utils.py:82-100 (union clamped to >= 0.1, result to <= 1)."""
    max_xy = jnp.minimum(box_a[..., 2:], box_b[..., 2:])
    min_xy = jnp.maximum(box_a[..., :2], box_b[..., :2])
    wh = jnp.clip(max_xy - min_xy, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = jnp.clip(area(box_a) + area(box_b) - inter, min=0.1)
    return jnp.clip(inter / union, max=1.0)


def mask_iou(masks_a: jnp.ndarray, masks_b: jnp.ndarray,
             iscrowd: bool = False) -> jnp.ndarray:
    """Pairwise mask IoU: [a, h, w] x [b, h, w] -> [a, b] via one MXU matmul.
    Ref: box_utils.py:98-113."""
    a = masks_a.reshape(masks_a.shape[0], -1)
    b = masks_b.reshape(masks_b.shape[0], -1)
    inter = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    area_a = a.sum(axis=1)[:, None]
    area_b = b.sum(axis=1)[None, :]
    denom = area_a if iscrowd else area_a + area_b - inter
    return jnp.where(denom > 0, inter / jnp.where(denom > 0, denom, 1), 0.0)


def elemwise_mask_iou(masks_a: jnp.ndarray, masks_b: jnp.ndarray) -> jnp.ndarray:
    """IoU between aligned masks [h, w, n] -> [n].  Ref: box_utils.py:115-126."""
    a = masks_a.reshape(-1, masks_a.shape[-1])
    b = masks_b.reshape(-1, masks_b.shape[-1])
    inter = (a * b).sum(axis=0)
    union = jnp.clip(a.sum(axis=0) + b.sum(axis=0) - inter, min=0.1)
    return jnp.clip(inter / union, max=1.0)


def change(gt: jnp.ndarray, priors: jnp.ndarray) -> jnp.ndarray:
    """Box2Pix -d_change metric, [num_gt, num_priors].
    Ref: box_utils.py:129-156."""
    gt_w = (gt[:, 2] - gt[:, 0])[:, None]
    gt_h = (gt[:, 3] - gt[:, 1])[:, None]
    diff = gt[:, None, :] - priors[None, :, :]
    diff = diff / jnp.stack([gt_w, gt_h, gt_w, gt_h], axis=-1)
    return -jnp.sqrt((diff ** 2).sum(axis=2))


def encode(matched: jnp.ndarray, priors: jnp.ndarray,
           use_yolo_regressors: bool = False) -> jnp.ndarray:
    """Encode matched gt (point form) against priors (center-size) into the
    network's regression space.  encode(decode(x)) == x.
    Ref: box_utils.py:229-265."""
    if use_yolo_regressors:
        boxes = center_size(matched)
        return jnp.concatenate([
            boxes[..., :2] - priors[..., :2],
            jnp.log(boxes[..., 2:] / priors[..., 2:])], axis=-1)
    g_cxcy = ((matched[..., :2] + matched[..., 2:]) / 2 - priors[..., :2]) \
        / (VARIANCES[0] * priors[..., 2:])
    wh = (matched[..., 2:] - matched[..., :2]) / priors[..., 2:]
    # Guard: padded gt rows have wh == 0; log(0) = -inf would poison grads.
    g_wh = jnp.log(jnp.maximum(wh, 1e-12)) / VARIANCES[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def decode(loc: jnp.ndarray, priors: jnp.ndarray,
           use_yolo_regressors: bool = False) -> jnp.ndarray:
    """Decode network regressions into point-form boxes.
    Ref: box_utils.py:267-314."""
    if use_yolo_regressors:
        boxes = jnp.concatenate([
            loc[..., :2] + priors[..., :2],
            priors[..., 2:] * jnp.exp(loc[..., 2:])], axis=-1)
        return point_form(boxes)
    xy = priors[..., :2] + loc[..., :2] * VARIANCES[0] * priors[..., 2:]
    wh = priors[..., 2:] * jnp.exp(loc[..., 2:] * VARIANCES[1])
    return jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)


def sanitize_coordinates(x1: jnp.ndarray, x2: jnp.ndarray, img_size: int,
                         padding: int = 0, cast: bool = True):
    """Scale relative coords to absolute, enforce x1 < x2, clamp to image.
    Ref: box_utils.py:328-347."""
    x1 = x1 * img_size
    x2 = x2 * img_size
    if cast:
        x1 = x1.astype(jnp.int32)
        x2 = x2.astype(jnp.int32)
    lo = jnp.minimum(x1, x2)
    hi = jnp.maximum(x1, x2)
    lo = jnp.clip(lo - padding, min=0)
    hi = jnp.clip(hi + padding, max=img_size)
    return lo, hi


def crop(masks: jnp.ndarray, boxes: jnp.ndarray,
         padding: int = 1) -> jnp.ndarray:
    """Zero out mask pixels outside each box — the differentiable "crop".

    masks: [h, w, n]; boxes: [n, 4] relative point form.
    Ref: box_utils.py:350-373 (index-compare mask implementation).
    """
    h, w, n = masks.shape
    x1, x2 = sanitize_coordinates(boxes[:, 0], boxes[:, 2], w, padding, cast=False)
    y1, y2 = sanitize_coordinates(boxes[:, 1], boxes[:, 3], h, padding, cast=False)

    rows = jax.lax.broadcasted_iota(masks.dtype, (h, w, n), 1)
    cols = jax.lax.broadcasted_iota(masks.dtype, (h, w, n), 0)

    keep = ((rows >= x1[None, None, :]) & (rows < x2[None, None, :]) &
            (cols >= y1[None, None, :]) & (cols < y2[None, None, :]))
    return masks * keep.astype(masks.dtype)


def log_sum_exp(x: jnp.ndarray) -> jnp.ndarray:
    """Stable log-sum-exp over the last axis using the *global* max, exactly
    as the reference does (box_utils.py:316-325) so OHEM scores match."""
    x_max = jax.lax.stop_gradient(jnp.max(x))
    return jnp.log(jnp.sum(jnp.exp(x - x_max), axis=-1)) + x_max
