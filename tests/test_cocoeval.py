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
