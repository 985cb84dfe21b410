"""Dump every ground-truth box (normalized cx, cy, w, h) from a COCO
annotation file to a .npy, for offline anchor design.

Equivalent of the reference ``scripts/save_bboxes.py``.
Usage: python scripts/save_bboxes.py <instances.json> [out.npy]
"""

import sys

import numpy as np

sys.path.insert(0, '.')
from yolact_tpu.data.coco import COCOIndex  # noqa: E402


def main():
    info = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else 'weights/bboxes.npy'
    coco = COCOIndex(info)
    rows = []
    for img_id, anns in coco.img_to_anns.items():
        im = coco.imgs[img_id]
        w, h = im['width'], im['height']
        for a in anns:
            if a.get('iscrowd'):
                continue
            x, y, bw, bh = a['bbox']
            rows.append([(x + bw / 2) / w, (y + bh / 2) / h, bw / w, bh / h])
    arr = np.array(rows, np.float32)
    np.save(out, arr)
    print(f'saved {len(arr)} boxes -> {out}')


if __name__ == '__main__':
    main()
