"""Shared IO + box math for the anchor-design scripts.

Dump formats (reference toolchain, ``scripts/save_bboxes.py`` /
``scripts/augment_bbox.py``):

- raw gt dump: rows ``[im_w, im_h, x, y, w, h]`` (absolute pixels) —
  ``.pkl`` holds the reference's list-of-lists, ``.npy`` an [N, 6] array.
- augmented dump: [N, 4] RELATIVE point-form boxes.
"""

from __future__ import annotations

import pickle

import numpy as np


def load_abs_dump(path: str) -> np.ndarray:
    """Raw gt dump -> [N, 6] float array [im_w, im_h, x, y, w, h]."""
    if path.endswith('.pkl'):
        with open(path, 'rb') as f:
            rows = pickle.load(f)
        arr = np.asarray(rows, np.float64)
    else:
        arr = np.load(path).astype(np.float64)
    if arr.ndim != 2 or arr.shape[1] != 6:
        raise ValueError(
            f'{path}: expected [N, 6] rows [im_w, im_h, x, y, w, h], '
            f'got {arr.shape}')
    return arr


def load_rel_dump(path: str) -> np.ndarray:
    """Augmented dump -> [N, 4] relative point-form boxes."""
    if path.endswith('.pkl'):
        with open(path, 'rb') as f:
            arr = np.asarray(pickle.load(f), np.float64)
    else:
        arr = np.load(path).astype(np.float64)
    if arr.ndim != 2 or arr.shape[1] != 4:
        raise ValueError(f'{path}: expected [N, 4] point-form, got {arr.shape}')
    return arr


def save_dump(arr: np.ndarray, path: str) -> None:
    if path.endswith('.pkl'):
        with open(path, 'wb') as f:
            pickle.dump(np.asarray(arr), f)
    else:
        np.save(path, np.asarray(arr))


def to_relative(b6: np.ndarray) -> np.ndarray:
    """[im_w, im_h, x, y, w, h] -> relative point form [x1, y1, x2, y2]
    (reference to_relative, scripts/bbox_recall.py)."""
    return np.concatenate(
        [b6[:, 2:4] / b6[:, :2], (b6[:, 2:4] + b6[:, 4:]) / b6[:, :2]],
        axis=1)


def iou_pt(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Point-form IoU [A, 4] x [B, 4] -> [A, B]."""
    ix = np.clip(np.minimum(a[:, None, 2], b[None, :, 2]) -
                 np.maximum(a[:, None, 0], b[None, :, 0]), 0, None)
    iy = np.clip(np.minimum(a[:, None, 3], b[None, :, 3]) -
                 np.maximum(a[:, None, 1], b[None, :, 1]), 0, None)
    inter = ix * iy
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-12)


def best_iou_chunked(boxes: np.ndarray, anchors: np.ndarray,
                     chunk: int = 1000) -> np.ndarray:
    """Per-gt max IoU against a big anchor set, chunked over gts."""
    out = np.zeros(len(boxes))
    for i in range(0, len(boxes), chunk):
        out[i:i + chunk] = iou_pt(boxes[i:i + chunk], anchors).max(axis=1)
    return out


def make_priors_spec(conv_size, scales, aspect_ratios) -> np.ndarray:
    """Anchors for one level in the DESIGN-SCRIPT convention
    (scripts/bbox_recall.py:make_priors): per pixel, zip(scales, ars)
    pairs each scale with its own aspect-ratio group; w = s*ar/conv_w,
    h = s/ar/conv_h; relative POINT form."""
    conv_h, conv_w = conv_size
    whs = []
    for scale, ars in zip(scales, aspect_ratios):
        for ar in ars:
            whs.append((scale * ar / conv_w, scale / ar / conv_h))
    whs = np.asarray(whs, np.float64)
    xs = (np.arange(conv_w) + 0.5) / conv_w
    ys = (np.arange(conv_h) + 0.5) / conv_h
    xy = np.stack(np.meshgrid(xs, ys), axis=-1).reshape(conv_h, conv_w, 1, 2)
    xy = np.broadcast_to(xy, (conv_h, conv_w, len(whs), 2))
    wh = np.broadcast_to(whs, xy.shape)
    pts = np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    return pts.reshape(-1, 4)


# The working anchor design the reference scripts iterate on
# (scripts/bbox_recall.py:104-117).
DEFAULT_SCALES = [[1.68, 2.91],
                  [2.95, 2.22, 0.84],
                  [2.23, 2.17, 3.12],
                  [0.76, 1.94, 2.72],
                  [2.10, 2.65],
                  [1.80, 1.92]]
DEFAULT_ASPECT_RATIOS = [[[0.72, 0.96], [0.68, 1.17]],
                         [[1.28, 0.66], [0.63, 1.23], [0.89, 1.40]],
                         [[2.05, 1.24], [0.57, 0.83], [0.61, 1.15]],
                         [[1.00, 2.21], [0.47, 1.60], [1.44, 0.79]],
                         [[1.00, 1.41, 0.71, 1.73, 0.58], [1.08]],
                         [[1.00, 1.41, 0.71, 1.73, 0.58], [1.00]]]
DEFAULT_CONV_SIZES = [(35, 35), (18, 18), (9, 9), (5, 5), (3, 3), (2, 2)]


def spec_priors(scales=None, aspect_ratios=None, conv_sizes=None
                ) -> np.ndarray:
    """All levels of a design-script anchor spec concatenated."""
    scales = scales if scales is not None else DEFAULT_SCALES
    ars = aspect_ratios if aspect_ratios is not None else \
        DEFAULT_ASPECT_RATIOS
    convs = conv_sizes if conv_sizes is not None else DEFAULT_CONV_SIZES
    return np.concatenate(
        [make_priors_spec(cs, s, a) for cs, s, a in zip(convs, scales, ars)],
        axis=0)


def center_size_to_pt(cs: np.ndarray) -> np.ndarray:
    """[N,4] (cx, cy, w, h) -> (x1, y1, x2, y2)."""
    return np.concatenate([cs[:, :2] - cs[:, 2:] / 2,
                           cs[:, :2] + cs[:, 2:] / 2], axis=1)


def config_priors_pt(config_name: str) -> np.ndarray:
    """A registered config's real priors in relative point form."""
    import sys
    sys.path.insert(0, '.')
    from yolact_tpu.config import get_config
    from yolact_tpu.ops.anchors import generate_priors
    cs = generate_priors(get_config(config_name)).astype(np.float64)
    return center_size_to_pt(cs)
