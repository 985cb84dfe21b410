"""Convert Pascal SBD .mat annotations to a COCO-format instances json
(equivalent of the reference ``scripts/convert_sbd.py``).

Usage: python scripts/convert_sbd.py <sbd_root> <split.txt> <out.json>
where sbd_root contains inst/*.mat and img/*.jpg.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, '.')
from yolact_tpu.data import rle as rle_codec  # noqa: E402

PASCAL_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor")


def main():
    root, split_file, out = sys.argv[1:4]
    from scipy.io import loadmat

    with open(split_file) as f:
        names = [l.strip() for l in f if l.strip()]

    images, annotations = [], []
    ann_id = 1
    for img_idx, name in enumerate(names):
        mat = loadmat(os.path.join(root, 'inst', name + '.mat'))
        gt = mat['GTinst'][0, 0]
        seg = gt['Segmentation']
        cats = gt['Categories'].ravel()
        h, w = seg.shape
        img_id = img_idx + 1
        images.append({'id': img_id, 'file_name': name + '.jpg',
                       'width': w, 'height': h})
        for inst_idx, cat in enumerate(cats):
            mask = seg == (inst_idx + 1)
            if not mask.any():
                continue
            ys, xs = np.where(mask)
            x1, y1 = int(xs.min()), int(ys.min())
            bw, bh = int(xs.max() - x1 + 1), int(ys.max() - y1 + 1)
            r = rle_codec.mask_to_rle(mask)
            annotations.append({
                'id': ann_id, 'image_id': img_id, 'category_id': int(cat),
                'bbox': [x1, y1, bw, bh], 'area': int(mask.sum()),
                'iscrowd': 0,
                'segmentation': {'size': r['size'],
                                 'counts': r['counts'].decode('ascii')}})
            ann_id += 1

    cats = [{'id': i + 1, 'name': n} for i, n in enumerate(PASCAL_CLASSES)]
    with open(out, 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': cats}, f)
    print(f'wrote {len(images)} images / {len(annotations)} anns -> {out}')


if __name__ == '__main__':
    main()
