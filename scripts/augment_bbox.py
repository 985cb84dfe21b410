"""Simulate the SSD augmentation pipeline's effect on gt box statistics
(equivalent of the reference ``scripts/augment_bbox.py``): runs the box math
of expand/crop/resize over a gt dump and prints the size distribution shift.

Usage: python scripts/augment_bbox.py [bboxes.npy] [n_rounds]
"""

import sys

import numpy as np


def simulate(boxes_cs, rng):
    """One augmentation round over center-size normalized boxes."""
    out = []
    for cx, cy, w, h in boxes_cs:
        x1, y1, x2, y2 = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
        # expand (zoom out) with p=0.5
        if rng.rand() < 0.5:
            ratio = rng.uniform(1, 4)
            left = rng.uniform(0, ratio - 1)
            top = rng.uniform(0, ratio - 1)
            x1, x2 = (x1 + left) / ratio, (x2 + left) / ratio
            y1, y2 = (y1 + top) / ratio, (y2 + top) / ratio
        # random crop keeping the center
        if rng.rand() < 5 / 6:  # a crop mode is sampled 5/6 of the time
            for _ in range(50):
                cw = rng.uniform(0.3, 1.0)
                ch = rng.uniform(0.3, 1.0)
                if ch / cw < 0.5 or ch / cw > 2:
                    continue
                cl = rng.uniform(0, 1 - cw)
                ct = rng.uniform(0, 1 - ch)
                ccx, ccy = (x1 + x2) / 2, (y1 + y2) / 2
                if not (cl < ccx < cl + cw and ct < ccy < ct + ch):
                    continue
                x1n = (max(x1, cl) - cl) / cw
                x2n = (min(x2, cl + cw) - cl) / cw
                y1n = (max(y1, ct) - ct) / ch
                y2n = (min(y2, ct + ch) - ct) / ch
                x1, y1, x2, y2 = x1n, y1n, x2n, y2n
                break
        if x2 > x1 and y2 > y1:
            out.append([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
    return np.array(out)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else 'weights/bboxes.npy'
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    boxes = np.load(path)
    rng = np.random.RandomState(0)

    def stats(b, name):
        s = np.sqrt(b[:, 2] * b[:, 3])
        print(f'{name}: n={len(b)} scale mean={s.mean():.4f} '
              f'p10={np.percentile(s, 10):.4f} p90={np.percentile(s, 90):.4f}')

    stats(boxes, 'original ')
    aug = boxes
    for r in range(rounds):
        aug = simulate(aug, rng)
    stats(aug, 'augmented')


if __name__ == '__main__':
    main()
