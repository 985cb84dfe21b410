"""K-means clustering of gt box sizes for anchor design (equivalent of the
reference ``scripts/cluster_bbox_sizes.py``).

Usage: python scripts/cluster_bbox_sizes.py [bboxes.npy] [k] [max_size]
Prints cluster centers as (scale_px, aspect_ratio) pairs.
"""

import sys

import numpy as np


def kmeans(x, k, iters=100, seed=0):
    rng = np.random.RandomState(seed)
    centers = x[rng.choice(len(x), k, replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        new = np.array([x[assign == i].mean(0) if (assign == i).any()
                        else centers[i] for i in range(k)])
        if np.allclose(new, centers):
            break
        centers = new
    return centers, assign


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else 'weights/bboxes.npy'
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    max_size = int(sys.argv[3]) if len(sys.argv) > 3 else 550

    boxes = np.load(path)
    wh = boxes[:, 2:4]
    # cluster in (log scale, log aspect) space
    scale = np.sqrt(wh[:, 0] * wh[:, 1]) * max_size
    ar = wh[:, 0] / np.maximum(wh[:, 1], 1e-6)
    feats = np.stack([np.log(np.maximum(scale, 1e-3)),
                      np.log(np.maximum(ar, 1e-3))], 1)
    centers, assign = kmeans(feats, k)
    order = np.argsort(centers[:, 0])
    print(f'{"scale_px":>10} {"aspect":>8} {"count":>8}')
    for i in order:
        n = int((assign == i).sum())
        print(f'{np.exp(centers[i, 0]):10.1f} {np.exp(centers[i, 1]):8.2f} '
              f'{n:8d}')


if __name__ == '__main__':
    main()
