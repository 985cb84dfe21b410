"""Anchor design by direct recall optimisation.

Reimplements the reference's alternating scheme
(``scripts/optimize_bboxes.py:108-204``): for each prediction level in
turn, hold every other level's anchors fixed, and Powell-optimise that
level's scales (on even outer iterations) or aspect ratios (odd) to
maximise anchor recall (fraction of gt boxes with best IoU > 0.5,
counting boxes already hit by the fixed levels).  Each inner optimisation
sees a fresh 5000-box batch so the design does not overfit one slice.

Also keeps a gradient-free mean-best-IoU refinement of a registered
config's pred_scales (``--config`` mode) — the variant useful when the
anchor layout is frozen and only the scale ladder moves.

Usage:
  python scripts/optimize_bboxes.py bboxes_aug.pkl [--iters 10]
  python scripts/optimize_bboxes.py bboxes_aug.pkl --config yolact_base
"""

from __future__ import annotations

import argparse
import copy
import sys

import numpy as np
from scipy.optimize import minimize

sys.path.insert(0, '.')
from scripts._bbox_io import (DEFAULT_ASPECT_RATIOS, DEFAULT_CONV_SIZES,  # noqa: E402
                              DEFAULT_SCALES, best_iou_chunked,
                              center_size_to_pt, load_rel_dump,
                              make_priors_spec)


def compute_hits(boxes, anchors, thresh=0.5):
    return best_iou_chunked(boxes, anchors) > thresh


def recall(hits, base_hits):
    return (hits | base_hits).mean()


class Designer:
    def __init__(self, boxes, scales=None, aspect_ratios=None,
                 conv_sizes=None, batch_size=5000):
        self.boxes = boxes
        self.scales = copy.deepcopy(scales or DEFAULT_SCALES)
        self.ars = copy.deepcopy(aspect_ratios or DEFAULT_ASPECT_RATIOS)
        self.conv_sizes = list(conv_sizes or DEFAULT_CONV_SIZES)
        self.batch_size = batch_size
        self.batch_idx = 0

    def _next_batch(self):
        n = len(self.boxes)
        start = self.batch_idx * self.batch_size
        if start >= n:
            self.batch_idx, start = 0, 0
        end = min(start + self.batch_size, n)
        self.batch_idx += 1
        return self.boxes[start:end]

    def _set_level(self, idx, x, optimize_scales):
        if optimize_scales:
            self.scales[idx] = [max(float(v), 0.0) for v in x]
        else:
            k = 0
            for g in self.ars[idx]:
                for j in range(len(g)):
                    g[j] = float(x[k])
                    k += 1

    def _level_anchors(self, idx):
        return make_priors_spec(self.conv_sizes[idx], self.scales[idx],
                                self.ars[idx])

    def optimize_level(self, idx, optimize_scales):
        batch = self._next_batch()
        base = np.concatenate([self._level_anchors(i)
                               for i in range(len(self.conv_sizes))
                               if i != idx], axis=0)
        base_hits = compute_hits(batch, base)

        def objective(x):
            self._set_level(idx, x, optimize_scales)
            return -recall(compute_hits(batch, self._level_anchors(idx)),
                           base_hits)

        x0 = list(self.scales[idx]) if optimize_scales else \
            [v for g in self.ars[idx] for v in g]
        res = minimize(objective, x0=np.asarray(x0, np.float64),
                       method='Powell')
        self._set_level(idx, res.x, optimize_scales)
        return -res.fun

    def run(self, iters=10, log=print):
        optimize_scales = False  # reference starts with aspect ratios
        for p in range(iters):
            for i in range(len(self.conv_sizes)):
                self.optimize_level(i, optimize_scales)
            what = 'scales' if optimize_scales else 'aspect ratios'
            log(f'(Iteration {p}) optimised {what}; '
                f'recall={self.full_recall() * 100:.2f}')
            optimize_scales = not optimize_scales
        return self.scales, self.ars

    def full_recall(self):
        anchors = np.concatenate(
            [self._level_anchors(i) for i in range(len(self.conv_sizes))],
            axis=0)
        return compute_hits(self.boxes, anchors).mean()


def pretty(x):
    if isinstance(x, (list, tuple)):
        return '[' + ', '.join(pretty(v) for v in x) + ']'
    return f'{float(x):.2f}'


def optimize_config_scales(boxes, config_name, maxiter=60):
    """Mean-best-IoU refinement of a registered config's scale ladder."""
    from yolact_tpu.config import get_config
    from yolact_tpu.ops.anchors import generate_priors

    cfg = get_config(config_name)
    base = np.array([s[0] for s in cfg.backbone.pred_scales], np.float64)
    sample = boxes[np.random.RandomState(0).choice(
        len(boxes), min(4000, len(boxes)), replace=False)]

    def mean_best_iou(scales):
        c = cfg.copy(backbone=cfg.backbone.copy(
            pred_scales=tuple((float(s),) for s in scales)))
        cs = generate_priors(c).astype(np.float64)
        return best_iou_chunked(sample, center_size_to_pt(cs)).mean()

    def neg(log_s):
        return -mean_best_iou(np.exp(log_s))

    print(f'start mean best IoU: {mean_best_iou(base):.4f}  scales={base}')
    res = minimize(neg, np.log(base), method='Nelder-Mead',
                   options={'maxiter': maxiter, 'xatol': 1e-2,
                            'fatol': 1e-4})
    best = np.exp(res.x)
    print(f'optimized mean best IoU: {-res.fun:.4f}')
    print('pred_scales =', [[round(float(s), 1)] for s in best])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('dump', nargs='?', default='weights/bboxes_aug.pkl')
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--batch-size', type=int, default=5000)
    ap.add_argument('--config', default=None,
                    help='refine a registered config\'s pred_scales '
                         'instead of the free-form spec')
    args = ap.parse_args(argv)

    boxes = load_rel_dump(args.dump)
    if args.config:
        optimize_config_scales(boxes, args.config)
        return

    d = Designer(boxes, batch_size=args.batch_size)
    scales, ars = d.run(iters=args.iters)
    print('scales = ' + pretty(scales))
    print('aspect_ratios = ' + pretty(ars))


if __name__ == '__main__':
    main()
