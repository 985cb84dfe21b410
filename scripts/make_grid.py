"""Grid-prototype designer for ``mask_proto_use_grid`` (data/grid.npy).

Non-interactive equivalent of the reference's slider UI
(``scripts/make_grid.py:1-204``): the same tri-directional sine-lattice
renderer parameterised by (center_x, center_y, scale, angle, spacing),
the same randomize distributions, and the same per-pixel uniqueness test
— driven from the CLI instead of matplotlib buttons.

Usage:
  # N randomized lattice grids (the reference's Randomize+Add loop):
  python scripts/make_grid.py --random 16 --seed 0 --out data/grid.npy
  # explicit params, one grid per spec "cx,cy,scale,angle,spacing":
  python scripts/make_grid.py --grid 0.5,0.5,4,0,0 --grid 0.3,0.7,2,1.0,0.5
  # coordinate-feature basis set (axis gradients, radius, gaussians):
  python scripts/make_grid.py --basis --out data/grid.npy
"""

from __future__ import annotations

import argparse
import math
import random
import sys

import numpy as np


def render_lattice(grid_h, grid_w, center_x=0.5, center_y=0.5,
                   scale=4.0, angle=0.0, spacing=0.0) -> np.ndarray:
    """Tri-directional sine lattice (make_grid.py:render): three line
    families at angle, +-60deg around the chosen center; spacing sharpens
    the lines exponentially; output clipped to [0, 1]."""
    x = np.tile(np.arange(grid_w, dtype=np.float64)[None, :],
                (grid_h, 1)) - grid_w * center_x
    y = np.tile(np.arange(grid_h, dtype=np.float64)[:, None],
                (1, grid_w)) - grid_h * center_y
    x /= scale
    y /= scale

    a1 = angle + math.pi / 3
    a2 = -angle + math.pi / 3
    a3 = angle
    z1 = x * math.sin(a1) + y * math.cos(a1)
    z2 = x * math.sin(a2) - y * math.cos(a2)
    z3 = x * math.sin(a3) + y * math.cos(a3)

    lines = 0.0
    for z in (z1, z2, z3):
        s = np.square(np.sin(z))
        lines = lines + np.exp(s * spacing) * s
    return np.clip(1 - lines / 3, 0, 1)


def random_params(rng: random.Random):
    """The Randomize button's distributions (make_grid.py:96-103)."""
    return dict(center_x=rng.uniform(0, 1), center_y=rng.uniform(0, 1),
                spacing=rng.uniform(-0.2, 2),
                scale=4 * math.exp(rng.uniform(-1, 1)),
                angle=rng.uniform(-math.pi, math.pi))


def basis_grids(grid_h, grid_w) -> list:
    """Deterministic coordinate-feature set: axis gradients, radius,
    3x3 gaussian bumps."""
    ys, xs = np.meshgrid(np.linspace(-1, 1, grid_h),
                         np.linspace(-1, 1, grid_w), indexing='ij')
    grids = [xs, ys, np.sqrt(xs ** 2 + ys ** 2)]
    for cy in (-0.5, 0, 0.5):
        for cx in (-0.5, 0, 0.5):
            grids.append(np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / 0.2))
    return grids


def test_uniqueness(grids: np.ndarray, quiet=False) -> bool:
    """Every pixel's across-grid feature vector must be distinct
    (make_grid.py:135-153) — otherwise the protonet cannot tell those
    positions apart from the grid features alone."""
    n, grid_h, grid_w = grids.shape
    flat = grids.reshape(n, -1)                       # [n, h*w]
    # pairwise L1 distance between pixel feature vectors
    d = np.abs(flat[:, :, None] - flat[:, None, :]).sum(axis=0)
    num_equal = (d < 1e-4).sum(axis=1)                # includes self
    bad = np.argwhere(num_equal > 1)
    if len(bad):
        p = int(bad[0][0])
        if not quiet:
            print(f'Pixel at ({p % grid_w}, {p // grid_w}) has '
                  f'{int(num_equal[p]) - 1} other pixel(s) with the same '
                  f'representation.')
        return False
    if not quiet:
        print('Each pixel has a distinct representation.')
    return True


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', default='35,35',
                    help='grid h,w (the P3 convout size)')
    ap.add_argument('--random', type=int, default=0, metavar='N',
                    help='add N randomized lattice grids')
    ap.add_argument('--grid', action='append', default=[],
                    metavar='CX,CY,SCALE,ANGLE,SPACING',
                    help='add one lattice grid with explicit params')
    ap.add_argument('--basis', action='store_true',
                    help='add the deterministic coordinate-feature set')
    ap.add_argument('--seed', type=int, default=None)
    ap.add_argument('--out', default='data/grid.npy')
    args = ap.parse_args(argv)

    h, w = (int(v) for v in args.size.split(','))
    rng = random.Random(args.seed)
    grids = []
    for spec in args.grid:
        cx, cy, sc, an, sp = (float(v) for v in spec.split(','))
        grids.append(render_lattice(h, w, cx, cy, sc, an, sp))
    for _ in range(args.random):
        grids.append(render_lattice(h, w, **random_params(rng)))
    if args.basis or not grids:
        grids.extend(basis_grids(h, w))

    arr = np.stack(grids).astype(np.float32)
    test_uniqueness(arr)
    np.save(args.out, arr)
    print(f'Saved {len(arr)} grids to "{args.out}"')


if __name__ == '__main__':
    sys.exit(main())
