"""Anchor recall over the training-set gt boxes.

Reports total recall plus the COCO small/medium/large breakdown (areas
under 32^2 / 96^2 pixels in the ORIGINAL image, reference
``scripts/bbox_recall.py:120-181``) for either a design-script anchor
spec (scales/aspect-ratios/conv-sizes, the iteration target of
optimize_bboxes) or a registered config's real prior grid.

Usage:
  python scripts/bbox_recall.py [bboxes.pkl|.npy]
      [--aug bboxes_aug.pkl]      # use augmented boxes for the IoU test
      [--config yolact_base]      # real config priors instead of the spec
      [--thresh 0.5]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, '.')
from scripts._bbox_io import (best_iou_chunked, config_priors_pt,  # noqa: E402
                              load_abs_dump, load_rel_dump, spec_priors,
                              to_relative)

SMALL, MEDIUM, LARGE = 0, 1, 2


def size_buckets(rows: np.ndarray) -> np.ndarray:
    """COCO size class per gt from the raw dump's absolute w*h."""
    area = rows[:, 4] * rows[:, 5]
    out = np.full(len(rows), LARGE)
    out[area < 96 ** 2] = MEDIUM
    out[area < 32 ** 2] = SMALL
    return out


def recall_report(boxes_rel, sizes, anchors, thresh=0.5):
    best = best_iou_chunked(boxes_rel, anchors)
    hits = best > thresh
    lines = [f'Total recall: {hits.mean() * 100:.2f}',
             f'Mean best IoU: {best.mean():.3f}', '']
    if sizes is not None:
        for i, name in ((SMALL, 'small'), (MEDIUM, 'medium'),
                        (LARGE, 'large')):
            sel = hits[sizes == i]
            lines.append(f'{name} recall: '
                         f'{(sel.mean() if len(sel) else 0) * 100:.2f}'
                         f'  (n={len(sel)})')
    return hits, lines


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('dump', nargs='?', default='weights/bboxes.pkl')
    ap.add_argument('--aug', default=None,
                    help='augmented relative dump (bboxes_aug) to test '
                         'against instead of the raw boxes')
    ap.add_argument('--config', default=None,
                    help='use a registered config\'s priors instead of '
                         'the design-script spec')
    ap.add_argument('--thresh', type=float, default=0.5)
    args = ap.parse_args(argv)

    rows = load_abs_dump(args.dump)
    sizes = size_buckets(rows)
    if args.aug:
        boxes_rel = load_rel_dump(args.aug)
        # augmented dumps are per-surviving-box; the size breakdown only
        # aligns when counts match (reference drops it for aug input too)
        if len(boxes_rel) != len(rows):
            sizes = None
    else:
        boxes_rel = to_relative(rows)

    anchors = config_priors_pt(args.config) if args.config else spec_priors()
    print(f'anchors={len(anchors)} boxes={len(boxes_rel)} '
          f'thresh={args.thresh}')
    _, lines = recall_report(boxes_rel, sizes, anchors, args.thresh)
    print('\n'.join(lines))


if __name__ == '__main__':
    main()
