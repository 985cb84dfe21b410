"""Gradient-free anchor-scale optimisation: search per-level pred_scales
maximizing mean best-IoU over a gt box dump (equivalent of the reference
``scripts/optimize_bboxes.py``, which uses scipy to fit anchors).

Usage: python scripts/optimize_bboxes.py [bboxes.npy] [config_name]
"""

import sys

import numpy as np
from scipy.optimize import minimize

sys.path.insert(0, '.')
from yolact_tpu.config import get_config  # noqa: E402
from yolact_tpu.ops.anchors import generate_priors  # noqa: E402
from scripts.bbox_recall import np_iou_cs  # noqa: E402


def mean_best_iou(cfg, boxes, sample=4000):
    priors = generate_priors(cfg)
    idx = np.random.RandomState(0).choice(len(boxes),
                                          min(sample, len(boxes)),
                                          replace=False)
    return float(np_iou_cs(boxes[idx], priors).max(axis=1).mean())


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else 'weights/bboxes.npy'
    config = sys.argv[2] if len(sys.argv) > 2 else 'yolact_base'
    boxes = np.load(path)
    cfg = get_config(config)

    base_scales = np.array([s[0] for s in cfg.backbone.pred_scales],
                           np.float64)

    def neg_iou(log_scales):
        scales = tuple((float(np.exp(s)),) for s in log_scales)
        c = cfg.copy(backbone=cfg.backbone.copy(pred_scales=scales))
        return -mean_best_iou(c, boxes)

    x0 = np.log(base_scales)
    print(f'start mean best IoU: {-neg_iou(x0):.4f}  scales={base_scales}')
    res = minimize(neg_iou, x0, method='Nelder-Mead',
                   options={'maxiter': 60, 'xatol': 1e-2, 'fatol': 1e-4})
    best = np.exp(res.x)
    print(f'optimized mean best IoU: {-res.fun:.4f}')
    print('pred_scales =', [[round(float(s), 1)] for s in best])


if __name__ == '__main__':
    main()
