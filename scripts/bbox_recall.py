"""Anchor recall analysis: what fraction of gt boxes have an anchor with
IoU above threshold under a given config (equivalent of the reference
``scripts/bbox_recall.py``).

Usage: python scripts/bbox_recall.py [bboxes.npy] [config_name] [iou_thresh]
"""

import sys

import numpy as np

sys.path.insert(0, '.')
from yolact_tpu.config import get_config  # noqa: E402
from yolact_tpu.ops.anchors import generate_priors  # noqa: E402


def np_iou_cs(a, b):
    """IoU between center-size boxes [n,4] x [m,4]."""
    def to_pt(x):
        return np.concatenate([x[:, :2] - x[:, 2:] / 2,
                               x[:, :2] + x[:, 2:] / 2], 1)
    A, B = to_pt(a), to_pt(b)
    ix = np.clip(np.minimum(A[:, None, 2], B[None, :, 2]) -
                 np.maximum(A[:, None, 0], B[None, :, 0]), 0, None)
    iy = np.clip(np.minimum(A[:, None, 3], B[None, :, 3]) -
                 np.maximum(A[:, None, 1], B[None, :, 1]), 0, None)
    inter = ix * iy
    aa = (a[:, 2] * a[:, 3])[:, None]
    ab = (b[:, 2] * b[:, 3])[None, :]
    return inter / np.maximum(aa + ab - inter, 1e-9)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else 'weights/bboxes.npy'
    config = sys.argv[2] if len(sys.argv) > 2 else 'yolact_base'
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5

    cfg = get_config(config)
    priors = generate_priors(cfg)
    boxes = np.load(path)

    hits = 0
    chunk = 2000
    best_all = []
    for i in range(0, len(boxes), chunk):
        iou = np_iou_cs(boxes[i:i + chunk], priors)
        best = iou.max(axis=1)
        best_all.append(best)
        hits += int((best >= thresh).sum())
    best_all = np.concatenate(best_all)
    print(f'config={config} priors={len(priors)} boxes={len(boxes)}')
    print(f'recall@{thresh}: {hits / len(boxes) * 100:.2f}%')
    print(f'mean best IoU: {best_all.mean():.3f}')


if __name__ == '__main__':
    main()
