"""Offline prototype-mask analysis: loads proto.npy / gt.npy dumped by
``--mask_proto_debug`` and visualises prototype combinations (pairs with the
reference's ``scripts/compute_masks.py`` + ``eval.py --mask_proto_debug``).

Usage: python scripts/compute_masks.py [proto.npy] [gt.npy] [out_prefix]
"""

import sys

import numpy as np


def main():
    proto_path = sys.argv[1] if len(sys.argv) > 1 else 'scripts/proto.npy'
    gt_path = sys.argv[2] if len(sys.argv) > 2 else 'scripts/gt.npy'
    prefix = sys.argv[3] if len(sys.argv) > 3 else 'scripts/proto_vis'

    proto = np.load(proto_path)   # [H, W, k]
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    k = proto.shape[-1]
    cols = int(np.ceil(np.sqrt(k)))
    rows = int(np.ceil(k / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows))
    for i, ax in enumerate(np.ravel(axes)):
        ax.axis('off')
        if i < k:
            ax.imshow(proto[:, :, i])
            ax.set_title(str(i), fontsize=8)
    fig.savefig(f'{prefix}_protos.png', dpi=120)
    print(f'saved {prefix}_protos.png')

    try:
        gt = np.load(gt_path)     # [n, H, W]
        # least-squares coefficients reconstructing each gt from prototypes
        H, W, _ = proto.shape
        P = proto.reshape(-1, k)
        for i, g in enumerate(gt[:4]):
            import cv2
            gr = cv2.resize(g.astype(np.float32), (W, H)) > 0.5
            coef, *_ = np.linalg.lstsq(P, gr.reshape(-1).astype(np.float32),
                                       rcond=None)
            recon = (P @ coef).reshape(H, W)
            fig, (a1, a2) = plt.subplots(1, 2, figsize=(6, 3))
            a1.imshow(gr); a1.set_title('gt'); a1.axis('off')
            a2.imshow(recon > 0.5); a2.set_title('lstsq recon'); a2.axis('off')
            fig.savefig(f'{prefix}_gt{i}.png', dpi=120)
        print(f'saved {prefix}_gt*.png')
    except FileNotFoundError:
        print('(no gt.npy; skipped reconstruction check)')


if __name__ == '__main__':
    main()
