"""Generate the out-of-the-box web-viewer demo assets.

Produces, from the synthetic pipeline (no COCO needed):
- ``web/demo_images/<id>.jpg`` — the images (server.py falls back to this
  directory when the COCO image root misses an id)
- ``web/dets/<name>.json`` — two web-json det sets over those images from
  differently-trained checkpoints, so the IoU inspector has a meaningful
  A/B out of the box (reference ships canned ``web/dets/*.json``)

Usage: python scripts/make_web_demo.py [--steps-a 200] [--steps-b 40]
"""

import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))

WEB = os.path.join(os.path.dirname(__file__), '..', 'web')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps-a', type=int, default=200)
    ap.add_argument('--steps-b', type=int, default=40)
    args = ap.parse_args()

    from pathlib import Path

    from _tiny import tiny_resnet_config
    from test_eval import _write_tiny_coco
    from test_map_ab import overfit_variables
    from yolact_tpu.config import register_config
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset

    tmp = Path(tempfile.mkdtemp(prefix='webdemo_'))
    img_dir, json_path = _write_tiny_coco(tmp, n_images=3, size=96)
    base = tiny_resnet_config().copy(max_size=128)
    base = base.copy(dataset=base.dataset.copy(
        valid_images=img_dir, valid_info=json_path,
        class_names=('thing', 'b', 'c', 'd'), label_map=None))

    demo_dir = os.path.join(WEB, 'demo_images')
    os.makedirs(demo_dir, exist_ok=True)
    for f in os.listdir(img_dir):
        shutil.copy(os.path.join(img_dir, f), os.path.join(demo_dir, f))
    print(f'demo images -> {demo_dir}')

    dataset = make_eval_dataset(base)
    for name, steps in (('tiny_demo_trained', args.steps_a),
                        ('tiny_demo_early', args.steps_b)):
        cfg = register_config(base.copy(name=name))
        variables = overfit_variables(cfg, dataset, steps=steps)
        evaluate_dataset(cfg, variables, dataset, quiet=True,
                         output_coco_json=True, output_web_json=True,
                         bbox_det_file=str(tmp / 'b.json'),
                         mask_det_file=str(tmp / 'm.json'),
                         web_det_path=os.path.join(WEB, 'dets'),
                         device_mask_iou=False)
        print(f'web/dets/{name}.json written ({steps} steps)')


if __name__ == '__main__':
    main()
