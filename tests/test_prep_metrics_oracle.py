"""Oracle: one full per-image metrics pass (postprocess -> greedy AP
matching -> APDataObject) vs the reference prep_metrics (eval.py:386-510),
including crowd-ignore."""

import importlib
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _refutil import import_reference


@pytest.fixture(scope='module')
def ref_eval():
    try:
        import_reference()
    except Exception as e:          # pragma: no cover
        pytest.skip(f'reference unavailable: {e}')
    import torch
    m = importlib.import_module('eval')
    # run the reference's CUDA-only paths on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    m.args = types.SimpleNamespace(output_coco_json=False, crop=True,
                                   score_threshold=0)
    return m


def test_prep_metrics_oracle(ref_eval):
    import torch
    from yolact_tpu.config import get_config
    from yolact_tpu.detect.detection import Detections
    from yolact_tpu.detect.postprocess import (finish_masks,
                                               postprocess_device,
                                               sanitize_boxes_absolute)
    from yolact_tpu.eval.evaluator import APDataObject, make_ap_data, \
        prep_metrics

    ref_config = importlib.import_module('data.config')
    C, D, Md, Hp = 5, 10, 8, 16
    w, h = 61, 49
    G, NC = 5, 1                      # gts incl. one crowd at the tail
    cfg = get_config('yolact_base').copy(num_classes=C + 1,
                                         max_num_detections=D)
    ref_config.cfg.replace(ref_config.yolact_base_config.copy(
        {'num_classes': C + 1, 'max_num_detections': D,
         'mask_proto_debug': False}))
    try:
        for seed in range(4):
            rng = np.random.RandomState(seed)
            xy1 = rng.rand(D, 2).astype(np.float32) * 0.6
            wh = rng.rand(D, 2).astype(np.float32) * 0.35 + 0.05
            boxes = np.concatenate([xy1, xy1 + wh], 1).astype(np.float32)
            coeffs = rng.randn(D, Md).astype(np.float32)
            scores = np.sort(rng.rand(D).astype(np.float32))[::-1].copy()
            classes = rng.randint(0, C, D).astype(np.int64)
            proto = rng.randn(Hp, Hp, Md).astype(np.float32)

            gxy1 = rng.rand(G, 2).astype(np.float32) * 0.5
            gwh = rng.rand(G, 2).astype(np.float32) * 0.4 + 0.08
            ggt = np.concatenate([gxy1, gxy1 + gwh], 1).astype(np.float32)
            gt_classes = rng.randint(0, C, G)
            gt = np.concatenate([ggt, gt_classes[:, None].astype(np.float32)],
                                1)
            gt_masks = (rng.rand(G, h, w) > 0.5).astype(np.float32)

            # reference pass
            ref_ap = ref_eval.make_ap_data() if hasattr(
                ref_eval, 'make_ap_data') else {
                    t: [[ref_eval.APDataObject() for _ in range(C)]
                        for _ in ref_eval.iou_thresholds]
                    for t in ('box', 'mask')}
            det = {'box': torch.from_numpy(boxes.copy()),
                   'mask': torch.from_numpy(coeffs.copy()),
                   'class': torch.from_numpy(classes.copy()),
                   'score': torch.from_numpy(scores.copy()),
                   'proto': torch.from_numpy(proto.copy())}
            ref_eval.prep_metrics(
                ref_ap, [{'detection': det, 'net': None}], None,
                gt.copy(), gt_masks.copy(), h, w, NC, 0)

            # our pass: postprocess + prep
            ours = Detections(boxes=boxes[None], masks=coeffs[None],
                              classes=classes.astype(np.int32)[None],
                              scores=scores[None],
                              valid=np.ones((1, D), bool),
                              proto=proto[None])
            masks_dev, dets2 = postprocess_device(cfg, ours)
            om = finish_masks(np.asarray(masks_dev[0]), w, h)
            ob = np.asarray(sanitize_boxes_absolute(ours.boxes, w, h)[0])
            gt_abs = ggt.copy()
            gt_abs[:, [0, 2]] *= w
            gt_abs[:, [1, 3]] *= h
            our_ap = make_ap_data(C)
            prep_metrics(our_ap, classes.astype(int), scores, scores,
                         ob, om, gt_abs, gt_classes.astype(int),
                         gt_masks > 0.5, NC)

            for t in ('box', 'mask'):
                for ti in range(len(ref_eval.iou_thresholds)):
                    for c in range(C):
                        ra = ref_ap[t][ti][c].get_ap() \
                            if not ref_ap[t][ti][c].is_empty() else -1
                        oa = our_ap[t][ti][c].get_ap() \
                            if not our_ap[t][ti][c].is_empty() else -1
                        assert abs(ra - oa) < 1e-9, \
                            (seed, t, ti, c, ra, oa)
    finally:
        ref_config.cfg.replace(ref_config.yolact_base_config)
