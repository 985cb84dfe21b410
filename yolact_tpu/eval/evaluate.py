"""Quantitative COCO evaluation driver.

Port of the reference ``evaluate`` loop (``eval.py:870-1003``): deterministic
badhash image order, per-image forward + detection, greedy AP matching into
APDataObject, final calc_map table; optional COCO-json output mode.  The
device work (preprocess-free forward + fast-NMS + mask assembly) is one
jitted program; the host only decodes images, upsamples the 100 padded
proto-res masks to the original size, and updates AP state.
"""

from __future__ import annotations

import random as _random
from typing import Dict, Optional

import numpy as np

from yolact_tpu.config import YolactConfig
from yolact_tpu.data.augmentations import BaseTransform
from yolact_tpu.data.coco import COCODetection
from yolact_tpu.detect.postprocess import finish_masks
from yolact_tpu.eval.coco_json import DetectionsWriter
from yolact_tpu.eval.evaluator import (badhash, calc_map, make_ap_data,
                                       prep_metrics)
from yolact_tpu.infer import Pipeline
from yolact_tpu.utils import timer
from yolact_tpu.utils.functions import MovingAverage, ProgressBar


def sanitize_boxes_np(boxes: np.ndarray, w: int, h: int) -> np.ndarray:
    """Relative point-form -> absolute int boxes (output_utils.py:97-99)."""
    x1 = np.minimum(boxes[:, 0], boxes[:, 2]) * w
    x2 = np.maximum(boxes[:, 0], boxes[:, 2]) * w
    y1 = np.minimum(boxes[:, 1], boxes[:, 3]) * h
    y2 = np.maximum(boxes[:, 1], boxes[:, 3]) * h
    out = np.stack([np.clip(x1, 0, w), np.clip(y1, 0, h),
                    np.clip(x2, 0, w), np.clip(y2, 0, h)], axis=1)
    return out.astype(np.int64)


def evaluate_dataset(cfg: YolactConfig, variables: Dict,
                     dataset: COCODetection,
                     maskiou_variables: Optional[Dict] = None,
                     max_images: int = -1,
                     fast_nms: bool = True,
                     cross_class_nms: bool = False,
                     score_threshold: float = 0.0,
                     crop_masks: bool = True,
                     shuffle: bool = False,
                     no_sort: bool = False,
                     output_coco_json: bool = False,
                     bbox_det_file: str = 'results/bbox_detections.json',
                     mask_det_file: str = 'results/mask_detections.json',
                     output_web_json: bool = False,
                     web_det_path: str = 'web/dets/',
                     benchmark: bool = False,
                     mask_proto_debug: bool = False,
                     quiet: bool = False) -> Optional[Dict]:
    """Returns the all_maps dict (or None for json/benchmark modes)."""
    pipeline = Pipeline(cfg, variables, maskiou_variables=maskiou_variables,
                        use_fast_nms=fast_nms,
                        use_cross_class_nms=cross_class_nms,
                        preprocess=False,
                        score_threshold=score_threshold)

    dataset_size = len(dataset) if max_images < 0 else \
        min(max_images, len(dataset))
    progress_bar = ProgressBar(30, dataset_size)
    frame_times = MovingAverage()

    dataset_indices = list(range(len(dataset)))
    if shuffle:
        _random.shuffle(dataset_indices)
    elif not no_sort:
        hashed = [badhash(x) for x in dataset.ids]
        dataset_indices.sort(key=lambda x: hashed[x])
    dataset_indices = dataset_indices[:dataset_size]

    compute_map = not output_coco_json and not benchmark
    ap_data = make_ap_data(len(cfg.dataset.class_names))
    detections = DetectionsWriter(cfg)

    import time
    for it, image_idx in enumerate(dataset_indices):
        timer.reset()
        with timer.env('Load Data'):
            img, gt, gt_masks, h, w, num_crowd = dataset.pull_item(image_idx)

        with timer.env('Network Extra'):
            out = pipeline(np.asarray(img)[None])
            valid = np.asarray(out.valid[0])

        if mask_proto_debug and it == 0:
            # dump prototype + gt masks for scripts/compute_masks.py
            # (eval.py:938-942, output_utils.py:62-64)
            import os
            os.makedirs('scripts', exist_ok=True)
            # re-run the raw forward to grab prototypes
            from yolact_tpu.models.yolact import Yolact
            preds = Yolact(cfg).apply(variables, np.asarray(img)[None])
            np.save('scripts/proto.npy', np.asarray(preds['proto'][0]))
            if gt_masks is not None:
                np.save('scripts/gt.npy', np.asarray(gt_masks))

        if benchmark:
            frame_times.add(timer.total_time())
            continue

        n = int(valid.sum())
        classes = np.asarray(out.classes[0])[:n]
        box_scores = np.asarray(out.scores[0])[:n]
        if out.mask_scores is not None and cfg.rescore_mask:
            mask_scores = np.asarray(out.mask_scores[0])[:n]
            if cfg.rescore_bbox:
                box_scores = mask_scores
        else:
            mask_scores = box_scores
        boxes_rel = np.asarray(out.boxes[0])[:n]
        proto_masks = np.asarray(out.masks[0])[:n]

        with timer.env('Postprocess'):
            boxes_abs = sanitize_boxes_np(boxes_rel, w, h)
            masks_full = finish_masks(proto_masks, w, h)

        if cfg.discard_mask_area > 0 and n > 0:
            # YOLACT++ small-mask discard (eval flag discard_mask_area)
            areas = masks_full.reshape(n, -1).sum(axis=1)
            keep = areas > cfg.discard_mask_area
            classes, box_scores = classes[keep], box_scores[keep]
            mask_scores = mask_scores[keep]
            boxes_abs, masks_full = boxes_abs[keep], masks_full[keep]
            n = int(keep.sum())

        if output_coco_json:
            with timer.env('JSON Output'):
                image_id = dataset.ids[image_idx]
                for i in range(n):
                    if (boxes_abs[i, 3] - boxes_abs[i, 1]) * \
                            (boxes_abs[i, 2] - boxes_abs[i, 0]) > 0:
                        detections.add_bbox(image_id, classes[i],
                                            boxes_abs[i], box_scores[i])
                        detections.add_mask(image_id, classes[i],
                                            masks_full[i], mask_scores[i])
        elif compute_map and gt is not None:
            gt = np.asarray(gt)
            gt_boxes = gt[:, :4].copy()
            gt_boxes[:, [0, 2]] *= w
            gt_boxes[:, [1, 3]] *= h
            with timer.env('Main loop'):
                prep_metrics(ap_data, classes, box_scores, mask_scores,
                             boxes_abs, masks_full, gt_boxes,
                             gt[:, 4].astype(int), np.asarray(gt_masks),
                             num_crowd)

        frame_times.add(timer.total_time())
        if not quiet:
            fps = 1 / frame_times.get_avg() if it > 0 else 0
            progress_bar.set_val(it + 1)
            print(f'\rProcessing Images  {progress_bar} '
                  f'{it + 1:6d} / {dataset_size:6d} ({(it + 1) * 100 / dataset_size:5.2f}%) '
                  f'{fps:7.2f} fps ', end='')

    if not quiet:
        print()

    if benchmark:
        print()
        print('Stats for the last frame:')
        timer.print_stats()
        avg = frame_times.get_avg()
        print(f'Average: {avg * 1000:5.2f} ms / frame ({1 / avg:5.2f} fps)')
        return None

    if output_coco_json:
        import os
        os.makedirs(os.path.dirname(bbox_det_file) or '.', exist_ok=True)
        detections.dump(bbox_det_file, mask_det_file)
        if output_web_json:
            detections.dump_web(web_det_path)
        return None

    return calc_map(ap_data, cfg.dataset.class_names, print_table=not quiet)


def make_eval_dataset(cfg: YolactConfig) -> COCODetection:
    return COCODetection(cfg.dataset.valid_images, cfg.dataset.valid_info,
                         transform=BaseTransform(cfg),
                         dataset_cfg=cfg.dataset,
                         has_gt=cfg.dataset.has_gt)
