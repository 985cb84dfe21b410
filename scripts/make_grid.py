"""Generate grid prototype features (data/grid.npy) for
``mask_proto_use_grid`` (non-interactive equivalent of the reference's
``scripts/make_grid.py`` designer).

Produces [num_grids, h, w] float32 patterns: axis gradients, radial
distance, and gaussian bumps — the standard coordinate-feature set.

Usage: python scripts/make_grid.py [h] [w] [out]
"""

import sys

import numpy as np


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 69
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 69
    out = sys.argv[3] if len(sys.argv) > 3 else 'data/grid.npy'

    ys, xs = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing='ij')
    grids = [xs, ys, np.sqrt(xs ** 2 + ys ** 2)]
    for cy in (-0.5, 0, 0.5):
        for cx in (-0.5, 0, 0.5):
            grids.append(np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / 0.2))
    arr = np.stack(grids).astype(np.float32)
    np.save(out, arr)
    print(f'wrote grid {arr.shape} -> {out}')


if __name__ == '__main__':
    main()
