import json
import os

import numpy as np
import pytest

from yolact_tpu.eval.evaluator import (APDataObject, badhash, calc_map,
                                       make_ap_data, prep_metrics,
                                       IOU_THRESHOLDS)


def test_badhash_deterministic():
    assert badhash(42) == badhash(42)
    assert badhash(1) != badhash(2)


def test_ap_perfect_detection():
    ap = APDataObject()
    ap.add_gt_positives(2)
    ap.push(0.9, True)
    ap.push(0.8, True)
    assert ap.get_ap() == pytest.approx(1.0)


def test_ap_no_detections():
    ap = APDataObject()
    ap.add_gt_positives(3)
    assert ap.get_ap() == 0


def test_ap_half_precision():
    # 1 TP at high score, 1 FP at lower score, 2 gt
    ap = APDataObject()
    ap.add_gt_positives(2)
    ap.push(0.9, True)
    ap.push(0.8, False)
    # recall reaches 0.5 with precision 1.0; beyond that precision 0
    # 101-point: x in [0, 0.5] -> 1.0 (51 points), rest 0
    assert ap.get_ap() == pytest.approx(51 / 101)


def test_prep_metrics_perfect():
    num_classes = 3
    ap_data = make_ap_data(num_classes)
    h = w = 32
    masks = np.zeros((2, h, w), bool)
    masks[0, 2:10, 2:10] = True
    masks[1, 15:25, 15:25] = True
    boxes = np.array([[2, 2, 10, 10], [15, 15, 25, 25]], np.float32)
    classes = [0, 1]
    scores = [0.9, 0.8]
    prep_metrics(ap_data, classes, scores, scores, boxes, masks,
                 boxes.copy(), classes, masks.copy(), num_crowd=0)
    maps = calc_map(ap_data, ['a', 'b', 'c'], print_table=False)
    assert maps['box']['all'] == pytest.approx(100.0)
    assert maps['mask']['all'] == pytest.approx(100.0)


def test_prep_metrics_crowd_ignored():
    """A false positive overlapping only a crowd region must not count."""
    num_classes = 2
    ap_data = make_ap_data(num_classes)
    h = w = 32
    # gt: one real object + one crowd (last)
    gt_masks = np.zeros((2, h, w), bool)
    gt_masks[0, 2:10, 2:10] = True
    gt_masks[1, 20:30, 20:30] = True
    gt_boxes = np.array([[2, 2, 10, 10], [20, 20, 30, 30]], np.float32)
    gt_classes = [0, 0]
    # dets: one perfect match + one det inside the crowd area
    det_masks = np.zeros((2, h, w), bool)
    det_masks[0, 2:10, 2:10] = True
    det_masks[1, 21:29, 21:29] = True
    det_boxes = np.array([[2, 2, 10, 10], [21, 21, 29, 29]], np.float32)
    prep_metrics(ap_data, [0, 0], [0.9, 0.95], [0.9, 0.95], det_boxes,
                 det_masks, gt_boxes, gt_classes, gt_masks, num_crowd=1)
    maps = calc_map(ap_data, ['a', 'b'], print_table=False)
    assert maps['box']['all'] == pytest.approx(100.0)

    # same scene without the crowd flag: the second det is now an FP
    ap_data2 = make_ap_data(num_classes)
    prep_metrics(ap_data2, [0, 0], [0.9, 0.95], [0.9, 0.95], det_boxes,
                 det_masks, gt_boxes[:1], gt_classes[:1], gt_masks[:1],
                 num_crowd=0)
    maps2 = calc_map(ap_data2, ['a', 'b'], print_table=False)
    assert maps2['box']['all'] < 100.0


def _write_tiny_coco(tmp_path, n_images=3, size=64):
    """Synthesize a minimal COCO dataset on disk (images + instances json)."""
    import cv2
    img_dir = tmp_path / 'images'
    img_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img_id = 100 + i
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f'{img_id:012d}.jpg'), img)
        images.append({'id': img_id, 'file_name': f'{img_id:012d}.jpg',
                       'width': size, 'height': size})
        for _ in range(2):
            x, y = int(rng.randint(0, size // 2)), int(rng.randint(0, size // 2))
            bw, bh = int(rng.randint(8, size // 2)), int(rng.randint(8, size // 2))
            poly = [x, y, x + bw, y, x + bw, y + bh, x, y + bh]
            annotations.append({
                'id': ann_id, 'image_id': img_id, 'category_id': 1,
                'bbox': [x, y, bw, bh], 'area': bw * bh, 'iscrowd': 0,
                'segmentation': [poly]})
            ann_id += 1
    cats = [{'id': 1, 'name': 'thing'}]
    info = {'images': images, 'annotations': annotations, 'categories': cats}
    json_path = tmp_path / 'instances.json'
    json_path.write_text(json.dumps(info))
    return str(img_dir), str(json_path)


@pytest.fixture(scope='module')
def tiny_eval_setup(tmp_path_factory):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from _tiny import tiny_resnet_config
    tmp = tmp_path_factory.mktemp('coco')
    img_dir, json_path = _write_tiny_coco(tmp)
    cfg = tiny_resnet_config()
    cfg = cfg.copy(dataset=cfg.dataset.copy(
        valid_images=img_dir, valid_info=json_path,
        class_names=('thing', 'b', 'c', 'd'), label_map=None))
    return cfg, img_dir, json_path


def test_evaluate_dataset_end_to_end(tiny_eval_setup, tmp_path):
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables

    cfg, _, _ = tiny_eval_setup
    dataset = make_eval_dataset(cfg)
    assert len(dataset) == 3
    variables = random_variables(cfg)
    maps = evaluate_dataset(cfg, variables, dataset, quiet=True)
    assert set(maps.keys()) == {'box', 'mask'}
    assert np.isfinite(maps['box']['all'])


def test_evaluate_coco_json_output(tiny_eval_setup, tmp_path):
    from yolact_tpu.data import rle as rle_codec
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables

    cfg, _, _ = tiny_eval_setup
    dataset = make_eval_dataset(cfg)
    variables = random_variables(cfg)
    bbox_file = str(tmp_path / 'bbox.json')
    mask_file = str(tmp_path / 'mask.json')
    evaluate_dataset(cfg, variables, dataset, output_coco_json=True,
                     bbox_det_file=bbox_file, mask_det_file=mask_file,
                     quiet=True)
    bbox_dets = json.loads(open(bbox_file).read())
    mask_dets = json.loads(open(mask_file).read())
    assert isinstance(bbox_dets, list)
    for d in mask_dets[:5]:
        # label_map=None: 0-based class c maps back to category c+1
        assert d['category_id'] in (1, 2, 3, 4)
        m = rle_codec.rle_to_mask({
            'size': d['segmentation']['size'],
            'counts': d['segmentation']['counts'].encode()})
        assert m.shape == (64, 64)


def test_evaluate_batched_matches_single(tiny_eval_setup):
    """eval_batch_size>1 must give identical mAP to batch 1."""
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables

    cfg, _, _ = tiny_eval_setup
    dataset = make_eval_dataset(cfg)
    variables = random_variables(cfg)
    m1 = evaluate_dataset(cfg, variables, dataset, quiet=True,
                          eval_batch_size=1)
    m2 = evaluate_dataset(cfg, variables, dataset, quiet=True,
                          eval_batch_size=2)
    assert m1 == m2


def test_evaluate_sharded_matches_single(tiny_eval_setup):
    """n_devices>1 (batch sharded over the mesh) must give the same mAP."""
    import jax
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables

    assert len(jax.devices()) >= 4  # conftest forces 8 virtual CPU devices
    cfg, _, _ = tiny_eval_setup
    dataset = make_eval_dataset(cfg)
    variables = random_variables(cfg)
    m1 = evaluate_dataset(cfg, variables, dataset, quiet=True,
                          eval_batch_size=1)
    # batch 2 over 4 devices: also exercises the round-up to 4
    m4 = evaluate_dataset(cfg, variables, dataset, quiet=True,
                          eval_batch_size=2, n_devices=4)
    assert m1 == m4


def test_evaluate_too_many_devices_raises(tiny_eval_setup):
    import jax
    import pytest
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables

    cfg, _, _ = tiny_eval_setup
    dataset = make_eval_dataset(cfg)
    variables = random_variables(cfg)
    with pytest.raises(ValueError, match='local devices'):
        evaluate_dataset(cfg, variables, dataset, quiet=True,
                         n_devices=len(jax.local_devices()) + 1)


def test_evaluate_traditional_nms_end_to_end(tiny_eval_setup):
    """--fast_nms=False runs the greedy host-NMS path through the full
    evaluator (detection.py:182-228 semantics) and yields finite maps."""
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables

    cfg, _, _ = tiny_eval_setup
    dataset = make_eval_dataset(cfg)
    variables = random_variables(cfg)
    maps = evaluate_dataset(cfg, variables, dataset, quiet=True,
                            fast_nms=False)
    assert set(maps.keys()) == {'box', 'mask'}
    assert np.isfinite(maps['box']['all'])
    assert np.isfinite(maps['mask']['all'])


def test_evaluate_benchmark_mode(tiny_eval_setup, capsys):
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables
    cfg, _, _ = tiny_eval_setup
    dataset = make_eval_dataset(cfg)
    variables = random_variables(cfg)
    out = evaluate_dataset(cfg, variables, dataset, benchmark=True, quiet=True)
    assert out is None
    captured = capsys.readouterr().out
    assert 'fps' in captured and 'ms / frame' in captured


def test_pad_batch_truncation(rng):
    from yolact_tpu.data.coco import pad_batch
    S, n = 16, 7
    imgs = [rng.rand(S, S, 3).astype(np.float32)]
    t = np.concatenate([rng.rand(n, 4), np.arange(n)[:, None]], 1)
    t[-2:, 4] = -1  # two crowds at the tail
    masks = [rng.rand(n, S, S).astype(np.float32)]
    batch = pad_batch(imgs, [t], masks, [2], max_gt=6)
    # crowds dropped first: 5 real + 1 crowd kept
    assert batch['num_gts'][0] == 6
    assert batch['num_crowds'][0] == 1
    assert (batch['gt_labels'][0, :5] >= 0).all()
    assert batch['gt_labels'][0, 5] == -1

    batch2 = pad_batch(imgs, [t], masks, [2], max_gt=10)
    assert batch2['num_gts'][0] == 7
    assert (batch2['gt_labels'][0, 7:] == -2).all()


def test_evaluate_display_mode(tiny_eval_setup, tmp_path):
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables
    cfg, _, _ = tiny_eval_setup
    dataset = make_eval_dataset(cfg)
    variables = random_variables(cfg)
    dd = str(tmp_path / 'displays')
    evaluate_dataset(cfg, variables, dataset, quiet=True, display=True,
                     display_dir=dd, max_images=2)
    assert len(os.listdir(dd)) == 2


def test_batch_loader_iterates(tiny_eval_setup):
    from yolact_tpu.data.augmentations import SSDAugmentation
    from yolact_tpu.data.coco import COCODetection
    from yolact_tpu.data.loader import BatchLoader
    cfg, img_dir, json_path = tiny_eval_setup
    ds = COCODetection(img_dir, json_path, transform=SSDAugmentation(cfg),
                       dataset_cfg=cfg.dataset)
    loader = BatchLoader(ds, batch_size=2, max_gt=8, num_workers=1,
                         prefetch=2)
    try:
        # next_batch streams across epoch boundaries (3 > one epoch here);
        # `for batch in loader` yields exactly one epoch like DataLoader
        for _ in range(3):
            batch = loader.next_batch()
            assert batch['image'].shape == (2, cfg.max_size, cfg.max_size, 3)
            assert batch['gt_boxes'].shape == (2, 8, 4)
            # masks ship bit-packed by default (8x less transfer)
            S = cfg.max_size
            assert batch['gt_masks_packed'].shape == (2, 8, S, -(-S // 8))
            assert batch['gt_masks_packed'].dtype == np.uint8
        assert len(list(loader)) == len(loader)  # one epoch per __iter__
    finally:
        loader.stop()


def test_device_mask_iou_matches_host(tiny_eval_setup):
    """The device mask-IoU path must reproduce the host path's mAP."""
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables
    cfg, _, _ = tiny_eval_setup
    dataset = make_eval_dataset(cfg)
    variables = random_variables(cfg)
    m_host = evaluate_dataset(cfg, variables, dataset, quiet=True,
                              device_mask_iou=False)
    m_dev = evaluate_dataset(cfg, variables, dataset, quiet=True,
                             device_mask_iou=True)
    for t in ('box', 'mask'):
        for k in m_host[t]:
            assert abs(m_host[t][k] - m_dev[t][k]) < 0.75, \
                (t, k, m_host[t][k], m_dev[t][k])


def test_evaluate_stem_s2d_matches_plain(tiny_eval_setup):
    """Dataset eval with the space-to-depth stem must give the same mAP
    as the plain stem (exact rearrange, same params)."""
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables

    cfg, _, _ = tiny_eval_setup
    dataset = make_eval_dataset(cfg)
    variables = random_variables(cfg)
    m1 = evaluate_dataset(cfg, variables, dataset, quiet=True)
    m2 = evaluate_dataset(cfg.copy(stem_s2d=True), variables, dataset,
                          quiet=True)
    assert m1 == m2


def test_evaluate_direct_mask_end_to_end(tiny_eval_setup):
    """mask_type=0 (direct) configs run through the full eval pipeline:
    no prototype branch, box-local mask patches upscaled on the host
    (output_utils.py:101-120 semantics)."""
    from yolact_tpu.config import MaskType
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables

    cfg, _, _ = tiny_eval_setup
    cfg = cfg.copy(mask_type=MaskType.DIRECT, mask_size=16)
    assert cfg.mask_dim == 256
    dataset = make_eval_dataset(cfg)
    variables = random_variables(cfg)
    maps = evaluate_dataset(cfg, variables, dataset, quiet=True)
    assert set(maps.keys()) == {'box', 'mask'}
    assert np.isfinite(maps['box']['all'])
    assert np.isfinite(maps['mask']['all'])

    # im700-style area filter must work for direct masks too (regression:
    # the DIRECT branch didn't compute areas -> NameError)
    maps2 = evaluate_dataset(cfg.copy(discard_mask_area=5 * 5), variables,
                             dataset, quiet=True)
    assert np.isfinite(maps2['mask']['all'])


def test_eval_no_discard_mask_area(tiny_eval_setup):
    """discard_mask_area is TRAINING-only in the reference
    (multibox_loss.py:630-632); eval must not drop small-mask detections."""
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables

    cfg, _, _ = tiny_eval_setup
    cfg = cfg.copy(discard_mask_area=10 ** 9)  # would drop EVERY detection
    dataset = make_eval_dataset(cfg)
    variables = random_variables(cfg)
    # with the old eval-time filter this raised no error but zeroed all
    # detections; now the filter must not exist at all — verify via json
    # output that detections survive
    import tempfile, os, json
    with tempfile.TemporaryDirectory() as td:
        bb, mm = os.path.join(td, 'b.json'), os.path.join(td, 'm.json')
        evaluate_dataset(cfg, variables, dataset, quiet=True,
                         output_coco_json=True, bbox_det_file=bb,
                         mask_det_file=mm)
        with open(mm) as f:
            dets = json.load(f)
    assert len(dets) > 0


def test_eval_prefetch_error_propagates(tiny_eval_setup):
    """A corrupt image must raise, not hang the evaluator forever."""
    import pytest
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables

    cfg, _, _ = tiny_eval_setup
    dataset = make_eval_dataset(cfg)
    orig = dataset.pull_item

    def bad_pull(idx):
        if idx == 1:
            raise IOError('corrupt image')
        return orig(idx)

    dataset.pull_item = bad_pull
    try:
        with pytest.raises(RuntimeError, match='eval prefetch failed'):
            evaluate_dataset(cfg, random_variables(cfg), dataset, quiet=True)
    finally:
        dataset.pull_item = orig


def test_eval_detect_box_only_mode(tiny_eval_setup):
    """--detect (eval_mask_branch=False) evaluates boxes without crashing
    on lincomb configs (regression: coeffs were reshaped as direct masks)."""
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    from yolact_tpu.infer import random_variables

    cfg, _, _ = tiny_eval_setup
    cfg = cfg.copy(eval_mask_branch=False)
    dataset = make_eval_dataset(cfg)
    maps = evaluate_dataset(cfg, random_variables(cfg), dataset, quiet=True)
    assert np.isfinite(maps['box']['all'])
