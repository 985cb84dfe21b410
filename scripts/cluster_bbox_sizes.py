"""Two-stage k-means over gt box sizes for anchor design (reference
``scripts/cluster_bbox_sizes.py``): cluster box SCALES (sqrt-area in
550-relative pixels) into k groups, then within each scale cluster the
aspect ratios — printed smallest scale first, aspect ratios by
popularity, with member counts.

Usage: python scripts/cluster_bbox_sizes.py [bboxes.pkl|.npy]
       [--scale-clusters 5] [--ar-clusters 3] [--max-size 550]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, '.')
from scripts._bbox_io import load_abs_dump  # noqa: E402


def kmeans_1d(x, k, seed=0, iters=300):
    rng = np.random.RandomState(seed)
    centers = np.sort(x[rng.choice(len(x), k, replace=False)])
    for _ in range(iters):
        assign = np.abs(x[:, None] - centers[None, :]).argmin(axis=1)
        new = np.array([x[assign == i].mean() if (assign == i).any()
                        else centers[i] for i in range(k)])
        if np.allclose(new, centers):
            break
        centers = new
    return centers, assign


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('dump', nargs='?', default='weights/bboxes.pkl')
    ap.add_argument('--scale-clusters', type=int, default=5)
    ap.add_argument('--ar-clusters', type=int, default=3)
    ap.add_argument('--max-size', type=int, default=550)
    args = ap.parse_args(argv)

    rows = load_abs_dump(args.dump)
    # wh in max_size-relative pixels; drop degenerate boxes (<=1px)
    wh = rows[:, 4:6] / rows[:, 0:2] * args.max_size
    wh = wh[(wh[:, 0] > 1) & (wh[:, 1] > 1)]

    scale = np.sqrt(wh[:, 0] * wh[:, 1])
    centers, assign = kmeans_1d(scale, args.scale_clusters, seed=99)
    counts = np.bincount(assign, minlength=args.scale_clusters)

    for idx in np.argsort(centers):
        sel = wh[assign == idx]
        if len(sel) == 0:  # kmeans cluster that lost all members
            print(f'{centers[idx]:.3f} (0) aspect ratios: (empty)\n')
            continue
        ars = sel[:, 0] / sel[:, 1]
        ac, aa = kmeans_1d(ars, min(args.ar_clusters, max(len(ars), 1)),
                           seed=int(idx))
        acnt = np.bincount(aa, minlength=len(ac))
        print(f'{centers[idx]:.3f} ({counts[idx]}) aspect ratios:')
        for j in np.argsort(-acnt):
            print(f'\t{ac[j]:.2f} ({acnt[j]})')
        print()


if __name__ == '__main__':
    main()
