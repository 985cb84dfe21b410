"""Dump every ground-truth box from a COCO annotation file for offline
anchor design (reference ``scripts/save_bboxes.py``).

Rows are ``[im_w, im_h, x, y, w, h]`` absolute pixels — the format every
other design script (augment_bbox, bbox_recall, cluster_bbox_sizes,
optimize_bboxes) consumes.  ``.pkl`` or ``.npy`` by extension.

Usage: python scripts/save_bboxes.py <instances.json> [out.pkl|.npy]
       [--exclude-crowd]

Crowd annotations are INCLUDED by default like the reference (it appends
every annotation with a bbox); --exclude-crowd drops them.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, '.')
from scripts._bbox_io import save_dump  # noqa: E402
from yolact_tpu.data.coco import COCOIndex  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('info')
    ap.add_argument('out', nargs='?', default='weights/bboxes.pkl')
    ap.add_argument('--exclude-crowd', action='store_true')
    args = ap.parse_args(argv)

    coco = COCOIndex(args.info)
    rows = []
    for img_id, anns in coco.img_to_anns.items():
        im = coco.imgs[img_id]
        w, h = im['width'], im['height']
        for a in anns:
            if a.get('iscrowd') and args.exclude_crowd:
                continue
            if 'bbox' in a:
                rows.append([w, h] + list(a['bbox']))
    arr = np.array(rows, np.float64)
    save_dump(arr, args.out)
    print(f'saved {len(arr)} boxes -> {args.out}')


if __name__ == '__main__':
    main()
