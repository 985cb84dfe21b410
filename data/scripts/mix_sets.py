"""Merge multiple COCO instance jsons into one (equivalent of the
reference ``data/scripts/mix_sets.py``).

Usage: python data/scripts/mix_sets.py out.json in1.json in2.json [...]
"""

import json
import sys


def main():
    out_path = sys.argv[1]
    images, annotations = [], []
    categories = None
    seen_imgs = set()
    next_ann = 1
    for path in sys.argv[2:]:
        with open(path) as f:
            d = json.load(f)
        if categories is None:
            categories = d.get('categories', [])
        for im in d.get('images', []):
            if im['id'] in seen_imgs:
                continue
            seen_imgs.add(im['id'])
            images.append(im)
        for ann in d.get('annotations', []):
            ann = dict(ann, id=next_ann)
            next_ann += 1
            annotations.append(ann)
    with open(out_path, 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': categories or []}, f)
    print(f'merged {len(sys.argv) - 2} files: {len(images)} images, '
          f'{len(annotations)} annotations -> {out_path}')


if __name__ == '__main__':
    main()
