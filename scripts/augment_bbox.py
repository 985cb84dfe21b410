"""Simulate the SSD augmentation pipeline on gt BOXES only.

Replays the box math of the train-time augmentation chain — Expand,
RandomSampleCrop, RandomMirror, Resize-to-550, ToPercentCoords — over a
raw gt dump and writes the augmented relative point-form boxes, the input
the anchor-recall/optimisation scripts consume (reference
``scripts/augment_bbox.py:1-171``; crop sampling semantics from
``utils/augmentations.py:279-405`` including the kept upstream quirks).

Usage:
  python scripts/augment_bbox.py [bboxes.pkl|.npy] [out_aug.pkl|.npy]
      [--max-size 550] [--seed N] [--stats]

Input rows are ``[im_w, im_h, x, y, w, h]`` absolute pixels (the
save_bboxes dump); output is [N', 4] relative point form.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, '.')
from scripts._bbox_io import (iou_pt, load_abs_dump, save_dump,  # noqa: E402
                              to_relative)

# (min_iou, max_iou) crop modes; None = keep the whole image
# (utils/augmentations.py:291-304 — note 0.4 is absent upstream too)
SAMPLE_OPTIONS = (
    None,
    (0.1, None),
    (0.3, None),
    (0.7, None),
    (0.9, None),
    (None, None),
)


def random_sample_crop(rng, height, width, boxes):
    """Box-only RandomSampleCrop.  Reference quirks preserved:
    the mode-acceptance test is ``overlap.min() < min_iou and
    max_iou < overlap.max()`` -> retry (augment_bbox.py:147), int-truncated
    rect corners, center-inclusion strict inequalities."""
    while True:
        mode = SAMPLE_OPTIONS[rng.randint(len(SAMPLE_OPTIONS))]
        if mode is None:
            return height, width, boxes
        min_iou, max_iou = mode
        min_iou = -np.inf if min_iou is None else min_iou
        max_iou = np.inf if max_iou is None else max_iou

        for _ in range(50):
            w = rng.uniform(0.3 * width, width)
            h = rng.uniform(0.3 * height, height)
            if h / w < 0.5 or h / w > 2:
                continue
            left = rng.uniform(0, width - w)
            top = rng.uniform(0, height - h)
            rect = np.array([int(left), int(top), int(left + w),
                             int(top + h)], np.float64)
            overlap = iou_pt(boxes, rect[None])[:, 0]
            if overlap.min() < min_iou and max_iou < overlap.max():
                continue
            centers = (boxes[:, :2] + boxes[:, 2:]) / 2.0
            m1 = (rect[0] < centers[:, 0]) & (rect[1] < centers[:, 1])
            m2 = (rect[2] > centers[:, 0]) & (rect[3] > centers[:, 1])
            mask = m1 & m2
            if not mask.any():
                continue
            cur = boxes[mask].copy()
            cur[:, :2] = np.maximum(cur[:, :2], rect[:2]) - rect[:2]
            cur[:, 2:] = np.minimum(cur[:, 2:], rect[2:]) - rect[:2]
            return h, w, cur


def prep_box(rng, row, max_size):
    """One gt box through expand -> crop -> mirror -> resize -> percent
    (augment_bbox.py:26-63)."""
    width, height = float(row[0]), float(row[1])
    boxes = np.array([[row[2], row[3], row[2] + row[4], row[3] + row[5]]],
                     np.float64)

    # Expand (zoom out): canvas grows by U(1,4), box shifts by the
    # int-truncated placement offset
    ratio = rng.uniform(1, 4)
    left = rng.uniform(0, width * ratio - width)
    top = rng.uniform(0, height * ratio - height)
    height *= ratio
    width *= ratio
    boxes[:, :2] += (int(left), int(top))
    boxes[:, 2:] += (int(left), int(top))

    height, width, boxes = random_sample_crop(rng, height, width, boxes)

    # RandomMirror
    if rng.randint(2):
        boxes[:, 0::2] = width - boxes[:, 2::-2]

    # Resize to max_size then ToPercentCoords
    boxes[:, [0, 2]] *= (max_size / width)
    boxes[:, [1, 3]] *= (max_size / height)
    return boxes / max_size


def augment_boxes(rows, max_size=550, seed=None, progress=True):
    rng = np.random.RandomState(seed)
    out = []
    for i, row in enumerate(rows):
        if progress and i % 50000 == 0 and i:
            print(f'Current idx: {i}')
        out.append(prep_box(rng, row, max_size))
    return np.concatenate(out, axis=0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('dump', nargs='?', default='weights/bboxes.pkl')
    ap.add_argument('out', nargs='?', default='weights/bboxes_aug.pkl')
    ap.add_argument('--max-size', type=int, default=550)
    ap.add_argument('--seed', type=int, default=None)
    ap.add_argument('--stats', action='store_true',
                    help='print the size-distribution shift')
    args = ap.parse_args(argv)

    rows = load_abs_dump(args.dump)
    aug = augment_boxes(rows, args.max_size, args.seed)
    save_dump(aug.astype(np.float32), args.out)
    print(f'augmented {len(rows)} boxes -> {len(aug)} ({args.out})')

    if args.stats:
        def scale_of(pt):
            return np.sqrt(np.maximum(
                (pt[:, 2] - pt[:, 0]) * (pt[:, 3] - pt[:, 1]), 0))
        orig = to_relative(rows)
        for name, b in (('original ', orig), ('augmented', aug)):
            s = scale_of(b)
            print(f'{name}: n={len(b)} scale mean={s.mean():.4f} '
                  f'p10={np.percentile(s, 10):.4f} '
                  f'p90={np.percentile(s, 90):.4f}')


if __name__ == '__main__':
    main()
