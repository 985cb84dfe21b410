"""Standalone COCO-protocol evaluation of detection result jsons.

Equivalent of the reference ``run_coco_eval.py`` (which feeds the
``--output_coco_json`` output files to pycocotools); here the COCOeval
protocol is implemented in-repo (yolact_tpu/eval/cocoeval.py).

Usage:
  python run_coco_eval.py --gt_ann_file=.../instances_val2017.json \
      --bbox_det_file=results/bbox_detections.json \
      --mask_det_file=results/mask_detections.json
"""

import argparse

from yolact_tpu.eval.cocoeval import COCOEvalLite


def parse_args():
    p = argparse.ArgumentParser(description='COCO result-json evaluation')
    p.add_argument('--bbox_det_file', default='results/bbox_detections.json')
    p.add_argument('--mask_det_file', default='results/mask_detections.json')
    p.add_argument('--gt_ann_file',
                   default='data/coco/annotations/instances_val2017.json')
    p.add_argument('--eval_type', default='both',
                   choices=('both', 'bbox', 'mask'))
    return p.parse_args()


def main():
    args = parse_args()
    if args.eval_type in ('both', 'bbox'):
        print('\nEvaluating BBoxes:')
        COCOEvalLite(args.gt_ann_file, args.bbox_det_file, 'bbox').evaluate()
    if args.eval_type in ('both', 'mask'):
        print('\nEvaluating Masks:')
        COCOEvalLite(args.gt_ann_file, args.mask_det_file, 'segm').evaluate()


if __name__ == '__main__':
    main()
