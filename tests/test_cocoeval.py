import json

import numpy as np
import pytest

from yolact_tpu.data import rle as rle_codec
from yolact_tpu.eval.cocoeval import COCOEvalLite


def make_gt(tmp_path, objs):
    """objs: list of (img_id, cat, bbox_xywh, iscrowd)."""
    img_ids = sorted({o[0] for o in objs})
    images = [{'id': i, 'width': 100, 'height': 100} for i in img_ids]
    anns = []
    for k, (img, cat, bbox, crowd) in enumerate(objs):
        x, y, w, h = bbox
        mask = np.zeros((100, 100), bool)
        mask[int(y):int(y + h), int(x):int(x + w)] = True
        r = rle_codec.mask_to_rle(mask)
        anns.append({'id': k + 1, 'image_id': img, 'category_id': cat,
                     'bbox': list(bbox), 'area': w * h, 'iscrowd': int(crowd),
                     'segmentation': {'size': r['size'],
                                      'counts': r['counts'].decode()}})
    gt = {'images': images, 'annotations': anns,
          'categories': [{'id': 1, 'name': 'a'}, {'id': 2, 'name': 'b'}]}
    p = tmp_path / 'gt.json'
    p.write_text(json.dumps(gt))
    return str(p)


def det(img, cat, bbox, score):
    x, y, w, h = bbox
    mask = np.zeros((100, 100), bool)
    mask[int(y):int(y + h), int(x):int(x + w)] = True
    r = rle_codec.mask_to_rle(mask)
    return {'image_id': img, 'category_id': cat, 'bbox': list(bbox),
            'score': score,
            'segmentation': {'size': r['size'], 'counts': r['counts'].decode()}}


def test_perfect_detections_ap1(tmp_path):
    gt = make_gt(tmp_path, [(1, 1, (10, 10, 20, 20), 0),
                            (1, 2, (50, 50, 30, 30), 0),
                            (2, 1, (5, 5, 40, 40), 0)])
    dets = [det(1, 1, (10, 10, 20, 20), 0.9),
            det(1, 2, (50, 50, 30, 30), 0.8),
            det(2, 1, (5, 5, 40, 40), 0.95)]
    for iou_type in ('bbox', 'segm'):
        stats = COCOEvalLite(gt, dets, iou_type).evaluate()
        assert stats['AP'] == pytest.approx(1.0), (iou_type, stats)
        assert stats['AR100'] == pytest.approx(1.0)


def test_missed_detection_halves_recall(tmp_path):
    gt = make_gt(tmp_path, [(1, 1, (10, 10, 20, 20), 0),
                            (1, 1, (60, 60, 20, 20), 0)])
    dets = [det(1, 1, (10, 10, 20, 20), 0.9)]
    stats = COCOEvalLite(gt, dets, 'bbox').evaluate()
    assert stats['AR100'] == pytest.approx(0.5)
    # AP: precision 1 up to recall 0.5 -> ~0.5 (50/101 bars + r=0)
    assert 0.45 < stats['AP'] < 0.55


def test_crowd_absorbs_fp(tmp_path):
    gt = make_gt(tmp_path, [(1, 1, (10, 10, 20, 20), 0),
                            (1, 1, (50, 50, 40, 40), 1)])  # crowd
    dets = [det(1, 1, (10, 10, 20, 20), 0.8),
            det(1, 1, (55, 55, 30, 30), 0.9)]  # inside crowd
    stats = COCOEvalLite(gt, dets, 'bbox').evaluate()
    assert stats['AP'] == pytest.approx(1.0)


def test_area_ranges(tmp_path):
    # one small (16x16=256 < 32^2) + one medium (69x69=4761 in [32^2, 96^2))
    gt = make_gt(tmp_path, [(1, 1, (10, 10, 16, 16), 0),
                            (1, 1, (30, 30, 69, 69), 0)])
    dets = [det(1, 1, (10, 10, 16, 16), 0.9),
            det(1, 1, (30, 30, 69, 69), 0.8)]
    stats = COCOEvalLite(gt, dets, 'bbox').evaluate()
    assert stats['APs'] == pytest.approx(1.0)
    assert stats['APm'] == pytest.approx(1.0)
    assert stats['APl'] == -1.0  # no large gt


def test_wrong_class_is_fp(tmp_path):
    gt = make_gt(tmp_path, [(1, 1, (10, 10, 20, 20), 0)])
    dets = [det(1, 2, (10, 10, 20, 20), 0.9)]
    stats = COCOEvalLite(gt, dets, 'bbox').evaluate()
    assert stats['AP'] == pytest.approx(0.0)


@pytest.mark.skipif(True, reason='pycocotools not installed in this image')
def test_against_pycocotools(tmp_path):
    pass


def test_custom_evaluator_matches_cocoeval_protocol(tmp_path):
    """The fast in-loop evaluator (eval/evaluator.py) and the full COCOeval
    protocol implementation must agree on simple scenes (the reference's
    stated design goal, eval.py:505-507)."""
    from yolact_tpu.eval.evaluator import calc_map, make_ap_data, prep_metrics

    rng = np.random.RandomState(0)
    gt_objs = []
    det_objs = []
    ap_data = make_ap_data(2)
    for img in (1, 2, 3):
        gts, dets_img = [], []
        for k in range(3):
            x, y = (int(v) for v in rng.randint(0, 50, 2))
            w, h = (int(v) for v in rng.randint(20, 40, 2))
            cat = int(rng.randint(1, 3))
            gt_objs.append((img, cat, (x, y, w, h), 0))
            gts.append((cat, (x, y, w, h)))
            # jittered detection; some misses
            if k < 2:
                dx, dy = (int(v) for v in rng.randint(-3, 3, 2))
                score = float(rng.rand() * 0.5 + 0.5)
                det_objs.append(det(img, cat, (x + dx, y + dy, w, h), score))
                dets_img.append((cat, (x + dx, y + dy, w, h), score))
        # one false positive per image
        fp = det(img, 1, (70, 70, 20, 20), 0.4)
        det_objs.append(fp)
        dets_img.append((1, (70, 70, 20, 20), 0.4))

        # feed the fast evaluator (expects x1y1x2y2 + full masks)
        def to_xyxy(b):
            return [b[0], b[1], b[0] + b[2], b[1] + b[3]]
        def to_mask(b):
            m = np.zeros((100, 100), bool)
            m[int(b[1]):int(b[1] + b[3]), int(b[0]):int(b[0] + b[2])] = True
            return m
        classes = [c - 1 for c, b, s in dets_img]
        scores = [s for c, b, s in dets_img]
        boxes = np.array([to_xyxy(b) for c, b, s in dets_img], np.float32)
        masks = np.stack([to_mask(b) for c, b, s in dets_img])
        gt_classes = [c - 1 for c, b in gts]
        gt_boxes = np.array([to_xyxy(b) for c, b in gts], np.float32)
        gt_masks = np.stack([to_mask(b) for c, b in gts])
        prep_metrics(ap_data, classes, scores, scores, boxes, masks,
                     gt_boxes, gt_classes, gt_masks, num_crowd=0)

    maps = calc_map(ap_data, ['a', 'b'], print_table=False)
    gt_json = make_gt(tmp_path, gt_objs)
    stats = COCOEvalLite(gt_json, det_objs, 'bbox').evaluate()
    # 'all' mAP over IoU .5:.95 should agree closely
    assert abs(maps['box']['all'] - stats['AP'] * 100) < 1.5, \
        (maps['box']['all'], stats['AP'] * 100)
    assert abs(maps['box'][50] - stats['AP50'] * 100) < 1.5


def test_ignored_gt_matches_only_once(tmp_path):
    """pycocotools marks even IGNORED (out-of-range, non-crowd) gt as
    matched; a second det on the same gt cannot re-match it and becomes
    an FP if its own area is in range (regression: both dets were
    silently ignored, inflating area-range APs)."""
    # gt area 25*40=1000 (small); ignored in the 'medium' pass
    gt = make_gt(tmp_path, [(70, 1, (10, 10, 25, 40), 0),
                            (70, 1, (40, 55, 69, 69), 0)])  # medium gt
    # both high-score dets CONTAIN the small gt (IoU ~0.976/0.962, above
    # every COCO threshold) but have medium areas (1025 / 1040)
    dets = [det(70, 1, (10, 10, 25, 41), 0.97),   # matches small gt: ign
            det(70, 1, (10, 10, 26, 40), 0.96),   # must NOT re-match ->
                                                  # FP in the medium pass
            det(70, 1, (40, 55, 69, 69), 0.95)]   # TP for medium gt
    stats = COCOEvalLite(gt, dets, 'bbox').evaluate()
    assert stats['APs'] == pytest.approx(1.0)
    # fixed: FP at score 0.96 above the medium TP halves APm; the
    # re-matching bug reported APm == 1.0
    assert stats['APm'] < 0.75


def test_area_boundary_closed_interval(tmp_path):
    """area == 32^2 belongs to BOTH 'small' and 'medium' (pycocotools
    uses closed [amin, amax] intervals)."""
    gt = make_gt(tmp_path, [(1, 1, (10, 10, 32, 32), 0)])  # area 1024
    dets = [det(1, 1, (10, 10, 32, 32), 0.9)]
    stats = COCOEvalLite(gt, dets, 'bbox').evaluate()
    assert stats['APs'] == pytest.approx(1.0)
    assert stats['APm'] == pytest.approx(1.0)
