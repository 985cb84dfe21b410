"""Oracle: our postprocess mask pipeline (assemble -> sigmoid -> crop ->
upsample -> binarize -> box sanitize) vs the reference postprocess
(layers/output_utils.py:15-122)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _refutil import import_reference


@pytest.fixture(scope='module')
def ref():
    try:
        return import_reference()
    except Exception as e:          # pragma: no cover
        pytest.skip(f'reference unavailable: {e}')


def test_postprocess_masks_boxes_oracle(ref):
    import torch
    ref_yolact, ref_config, _, _ = ref
    from layers import output_utils as ref_out

    from yolact_tpu.config import get_config
    from yolact_tpu.detect.detection import Detections
    from yolact_tpu.detect.postprocess import (finish_masks,
                                               postprocess_device,
                                               sanitize_boxes_absolute)

    C, D, Md, Hp = 6, 12, 8, 16
    w, h = 73, 57
    cfg = get_config('yolact_base').copy(num_classes=C,
                                         max_num_detections=D)
    ref_config.cfg.replace(ref_config.yolact_base_config.copy(
        {'num_classes': C, 'max_num_detections': D,
         'mask_proto_debug': False}))  # eval.py sets this at runtime
    try:
        for seed in range(4):
            rng = np.random.RandomState(seed)
            xy1 = rng.rand(D, 2).astype(np.float32) * 0.6
            wh = rng.rand(D, 2).astype(np.float32) * 0.35 + 0.05
            boxes = np.concatenate([xy1, xy1 + wh], 1).astype(np.float32)
            coeffs = rng.randn(D, Md).astype(np.float32)
            scores = np.sort(rng.rand(D).astype(np.float32))[::-1].copy()
            classes = rng.randint(0, C - 1, D).astype(np.int64)
            proto = rng.randn(Hp, Hp, Md).astype(np.float32)

            # copies: the reference postprocess mutates box/score
            # tensors in place (scales boxes to pixel space), and
            # torch.from_numpy shares the numpy buffers
            det = {'box': torch.from_numpy(boxes.copy()),
                   'mask': torch.from_numpy(coeffs.copy()),
                   'class': torch.from_numpy(classes.copy()),
                   'score': torch.from_numpy(scores.copy()),
                   'proto': torch.from_numpy(proto.copy())}
            rc, rs, rb, rm = ref_out.postprocess(
                [{'detection': det, 'net': None}], w, h,
                crop_masks=True, score_threshold=0)
            rm = rm.numpy()
            rb = rb.numpy()

            ours = Detections(
                boxes=np.asarray(boxes)[None],
                masks=np.asarray(coeffs)[None],
                classes=classes.astype(np.int32)[None],
                scores=np.asarray(scores)[None],
                valid=np.ones((1, D), bool),
                proto=np.asarray(proto)[None])
            masks_dev, dets2 = postprocess_device(cfg, ours)
            om = finish_masks(np.asarray(masks_dev[0]), w, h)
            ob = np.asarray(sanitize_boxes_absolute(
                np.asarray(ours.boxes), w, h)[0])

            np.testing.assert_array_equal(om.astype(np.uint8),
                                          rm.astype(np.uint8),
                                          err_msg=f'seed {seed}')
            np.testing.assert_array_equal(ob, rb, err_msg=f'seed {seed}')
            np.testing.assert_array_equal(
                np.asarray(dets2.classes[0]), classes.astype(np.int32))
    finally:
        ref_config.cfg.replace(ref_config.yolact_base_config)


def test_postprocess_direct_mask_oracle(ref):
    """mask_type=0 (direct) branch: per-detection mask patches upscaled
    into their boxes (output_utils.py:101-120)."""
    import torch
    ref_yolact, ref_config, _, _ = ref
    from layers import output_utils as ref_out

    from yolact_tpu.config import MaskType, get_config
    from yolact_tpu.detect.detection import Detections
    from yolact_tpu.detect.postprocess import (finish_masks_direct,
                                               postprocess_device,
                                               sanitize_boxes_absolute)

    C, D, S = 6, 10, 16
    w, h = 73, 57
    cfg = get_config('yolact_base').copy(
        num_classes=C, max_num_detections=D,
        mask_type=MaskType.DIRECT, mask_size=S)
    ref_config.cfg.replace(ref_config.yolact_base_config.copy(
        {'num_classes': C, 'max_num_detections': D,
         'mask_type': ref_config.mask_type.direct, 'mask_size': S,
         'mask_proto_debug': False}))
    try:
        for seed in range(4):
            rng = np.random.RandomState(seed)
            xy1 = rng.rand(D, 2).astype(np.float32) * 0.6
            wh = rng.rand(D, 2).astype(np.float32) * 0.35 + 0.05
            boxes = np.concatenate([xy1, xy1 + wh], 1).astype(np.float32)
            # one degenerate box to hit the skip guard
            boxes[1, 2] = boxes[1, 0]
            # sigmoid-activated mask patches, as the head emits
            flat = (1 / (1 + np.exp(-rng.randn(D, S * S)))).astype(np.float32)
            scores = np.sort(rng.rand(D).astype(np.float32))[::-1].copy()
            classes = rng.randint(0, C - 1, D).astype(np.int64)

            det = {'box': torch.from_numpy(boxes.copy()),
                   'mask': torch.from_numpy(flat.copy()),
                   'class': torch.from_numpy(classes.copy()),
                   'score': torch.from_numpy(scores.copy())}
            rc, rs, rb, rm = ref_out.postprocess(
                [{'detection': det, 'net': None}], w, h,
                crop_masks=True, score_threshold=0)
            rm = rm.numpy()
            rb = rb.numpy()

            ours = Detections(
                boxes=np.asarray(boxes)[None],
                masks=np.asarray(flat)[None],
                classes=classes.astype(np.int32)[None],
                scores=np.asarray(scores)[None],
                valid=np.ones((1, D), bool),
                proto=None)
            masks_dev, _ = postprocess_device(cfg, ours)
            ob = np.asarray(sanitize_boxes_absolute(
                np.asarray(ours.boxes), w, h)[0])
            om = finish_masks_direct(np.asarray(masks_dev[0]), ob, w, h)

            np.testing.assert_array_equal(ob, rb, err_msg=f'seed {seed}')
            np.testing.assert_array_equal(om.astype(np.uint8),
                                          rm.astype(np.uint8),
                                          err_msg=f'seed {seed}')
    finally:
        ref_config.cfg.replace(ref_config.yolact_base_config)
