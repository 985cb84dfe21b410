"""Full-run mAP-table oracle.

Runs the reference's ENTIRE ``eval.py`` evaluate loop (badhash image order
-> dataset pull -> forward -> Detect -> postprocess -> prep_metrics ->
calc_map, ``/root/reference/eval.py:870-1003``) on a synthetic COCO
directory with briefly-trained weights, and our real ``cli/eval.py``
``main()`` on the same directory consuming the same ``.pth`` file, then
asserts the two printed mAP tables are EQUAL at every IoU threshold for
both box and mask.

This covers the integration seams the per-stage oracles can't: image
ordering, score plumbing (box vs mask score columns), rescore gating, the
.pth import path, and AP accumulation across images.  The weights are
overfit on the eval images themselves so detections are confident and the
tables are far from zero (random weights would make equality trivial).

The reference's pycocotools dependency is satisfied with a shim backed by
our own annotation index + polygon rasterizer, so both pipelines see
bit-identical ground truth.
"""

import importlib
import json
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _refutil import (import_reference, install_ref_cython_nms_shim,
                      install_ref_dcn_shim)
from _tiny import tiny_plus_config, tiny_resnet_config

torch = pytest.importorskip('torch')

pytestmark = pytest.mark.skipif(not os.path.isdir('/root/reference'),
                                reason='reference repo not available')


def _write_oracle_coco(tmp_path, n_images=6):
    """Synthetic COCO dir: non-square images, 4 categories, polygon masks,
    one crowd annotation; image ids chosen so badhash permutes order."""
    import cv2
    img_dir = tmp_path / 'images'
    img_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(7)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img_id = 1000 + 37 * i          # spread so badhash reorders
        h = int(rng.randint(56, 96))
        w = int(rng.randint(56, 96))
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f'{img_id:012d}.jpg'), img)
        images.append({'id': img_id, 'file_name': f'{img_id:012d}.jpg',
                       'width': w, 'height': h})
        for j in range(3):
            x = int(rng.randint(0, w // 2))
            y = int(rng.randint(0, h // 2))
            bw = int(rng.randint(10, w - x - 1))
            bh = int(rng.randint(10, h - y - 1))
            poly = [x, y, x + bw, y, x + bw, y + bh, x, y + bh]
            iscrowd = 1 if (i == 2 and j == 2) else 0
            annotations.append({
                'id': ann_id, 'image_id': img_id,
                'category_id': int(rng.randint(1, 5)),
                'bbox': [x, y, bw, bh], 'area': bw * bh,
                'iscrowd': iscrowd, 'segmentation': [poly]})
            ann_id += 1
    cats = [{'id': c, 'name': n}
            for c, n in enumerate(('aa', 'bb', 'cc', 'dd'), start=1)]
    info = {'images': images, 'annotations': annotations, 'categories': cats}
    json_path = tmp_path / 'instances.json'
    json_path.write_text(json.dumps(info))
    return str(img_dir), str(json_path)


class _ShimCOCO:
    """pycocotools.coco.COCO lookalike backed by our JSON index and our
    polygon rasterizer (data/rle.py) — both pipelines see identical gt."""

    def __init__(self, ann_file):
        with open(ann_file) as f:
            d = json.load(f)
        self.imgs = {im['id']: im for im in d.get('images', [])}
        self.anns = {a['id']: a for a in d.get('annotations', [])}
        self.imgToAnns = {}
        for a in d.get('annotations', []):
            self.imgToAnns.setdefault(a['image_id'], []).append(a)

    def getAnnIds(self, imgIds=None):
        return [a['id'] for a in self.imgToAnns.get(imgIds, [])]

    def loadAnns(self, ids):
        return [dict(self.anns[i]) for i in ids]

    def loadImgs(self, i):
        return [self.imgs[i]]

    def annToMask(self, ann):
        from yolact_tpu.data import rle as rle_codec
        im = self.imgs[ann['image_id']]
        return rle_codec.ann_to_mask(ann['segmentation'], im['height'],
                                     im['width']).astype(np.uint8)


def _tiny_ref_cfg(ref_config, img_dir, json_path, variant='base'):
    base = (ref_config.yolact_plus_resnet50_config if variant == 'plus'
            else ref_config.yolact_base_config)
    overrides = {
        'max_size': 128,
        'num_classes': 5,
        'backbone': base.backbone.copy({
            'args': (([1, 1, 1, 1], [0, 1, 1, 1]) if variant == 'plus'
                     else ([1, 1, 1, 1],)),
            'pred_scales': [[6], [12], [24], [48], [96]],
        }),
        'mask_proto_net': [(8, 3, {'padding': 1}), (None, -2, {}),
                           (8, 1, {})],
        'extra_head_net': [(16, 3, {'padding': 1})],
        'fpn': base.fpn.copy({'num_features': 16}),
        'dataset': ref_config.dataset_base.copy({
            'name': 'tiny_oracle',
            'valid_images': img_dir, 'valid_info': json_path,
            'class_names': ('aa', 'bb', 'cc', 'dd'),
            'label_map': None,
        }),
    }
    if variant == 'plus':
        overrides['maskiou_net'] = [(8, 3, {'stride': 2}),
                                    (16, 3, {'stride': 2}),
                                    (32, 3, {'stride': 2})]
    return base.copy(overrides)


_overfit_cache = {}


def _overfit_reference(ref_yolact, ref_config, dataset, steps=250, lr=2e-3,
                       cache_key=None):
    """Briefly train the reference torch net on the eval images themselves
    (reference loss + SGD) so eval produces well-localised detections.
    cache_key reuses the trained weights across NMS legs of the same
    variant (the training is NMS-independent)."""
    if cache_key is not None and cache_key in _overfit_cache:
        net = ref_yolact.Yolact()
        net.load_state_dict(_overfit_cache[cache_key])
        net.train()
        return net
    mbl = importlib.import_module('layers.modules.multibox_loss')
    torch.manual_seed(0)
    net = ref_yolact.Yolact()
    net.train()
    criterion = mbl.MultiBoxLoss(
        num_classes=ref_config.cfg.num_classes,
        pos_threshold=ref_config.cfg.positive_iou_threshold,
        neg_threshold=ref_config.cfg.negative_iou_threshold,
        negpos_ratio=ref_config.cfg.ohem_negpos_ratio)
    items = [dataset.pull_item(i) for i in range(len(dataset))]
    images = torch.stack([it[0] for it in items]).float()
    targets = [torch.from_numpy(np.asarray(it[1])).float() for it in items]
    masks = [torch.from_numpy(np.asarray(it[2])).float() for it in items]
    num_crowds = [it[5] for it in items]
    opt = torch.optim.SGD(net.parameters(), lr=lr, momentum=0.9)
    for step in range(steps):
        preds = net(images)
        # forward() splits crowds off masks/targets IN PLACE
        # (multibox_loss.py:67-68) — feed fresh lists every step like the
        # reference's data loader does
        losses = criterion(net, preds, [t.clone() for t in targets],
                           [m.clone() for m in masks], list(num_crowds))
        loss = sum(losses.values())
        opt.zero_grad()
        loss.backward()
        opt.step()
    assert torch.isfinite(loss), loss
    if cache_key is not None:
        _overfit_cache[cache_key] = {k: v.clone() for k, v in
                                     net.state_dict().items()}
    return net


@pytest.mark.slow
@pytest.mark.parametrize('variant,fast_nms', [
    ('base', True),
    # DCN backbone + maskiou rescoring through the WHOLE loop (the per-stage
    # oracles cover them in isolation); the reference's DCN runs through the
    # pure-torch CUDA-semantics shim (install_ref_dcn_shim)
    ('plus', True),
    # traditional (greedy per-class) NMS leg incl. maskiou rescoring on that
    # path; the reference runs its real traditional_nms with cython_nms
    # transcribed to numpy (install_ref_cython_nms_shim)
    ('plus', False),
], ids=['base-fastnms', 'plus-fastnms', 'plus-tradnms'])
def test_full_eval_map_table_oracle(tmp_path, variant, fast_nms):
    ref_yolact, ref_config, _, _ = import_reference()
    # the shim must be in place before reference data.coco's late import
    sys.modules['pycocotools.coco'].COCO = _ShimCOCO
    ref_coco = importlib.import_module('data.coco')
    ref_eval = importlib.import_module('eval')
    ref_aug = importlib.import_module('utils.augmentations')
    if variant == 'plus':
        install_ref_dcn_shim()
    if not fast_nms:
        install_ref_cython_nms_shim()

    img_dir, json_path = _write_oracle_coco(tmp_path)
    old_cfg = ref_config.cfg.copy()
    ref_config.set_cfg('yolact_plus_resnet50_config' if variant == 'plus'
                       else 'yolact_base_config')
    ref_config.cfg.replace(
        _tiny_ref_cfg(ref_config, img_dir, json_path, variant))
    torch.Tensor.cuda = lambda self, *a, **k: self
    name = f'tiny_oracle_{variant}_{"fast" if fast_nms else "trad"}'
    try:
        ref_dataset = ref_coco.COCODetection(
            img_dir, json_path,
            transform=ref_aug.BaseTransform(),
            target_transform=ref_coco.COCOAnnotationTransform())
        net = _overfit_reference(ref_yolact, ref_config, ref_dataset,
                                 cache_key=variant)

        pth = str(tmp_path / f'{name}_5_250.pth')
        torch.save(net.state_dict(), pth)

        # ---- reference full eval loop ----
        net.eval()
        ref_eval.args = types.SimpleNamespace(
            fast_nms=fast_nms, cross_class_nms=False, mask_proto_debug=False,
            image=None, images=None, video=None, display=False,
            benchmark=False, shuffle=False, no_sort=False, no_bar=True,
            max_images=-1, output_coco_json=False, output_web_json=False,
            crop=True, score_threshold=0, top_k=5, cuda=False,
            ap_data_file=str(tmp_path / 'ref_ap.pkl'))
        with torch.no_grad():
            ref_maps = ref_eval.evaluate(net, ref_dataset, train_mode=True)

        # ---- our full CLI on the same dir + the same .pth ----
        from yolact_tpu.config import register_config
        from yolact_tpu.cli import eval as our_eval_cli
        from yolact_tpu.eval.evaluate import calc_map_from_file

        cfg = (tiny_plus_config() if variant == 'plus'
               else tiny_resnet_config())
        cfg = cfg.copy(
            name=name,
            compute_dtype='float32',
            dataset=cfg.dataset.copy(
                valid_images=img_dir, valid_info=json_path,
                class_names=('aa', 'bb', 'cc', 'dd'), label_map=None))
        register_config(cfg, name)
        ap_file = str(tmp_path / 'our_ap.pkl')
        our_eval_cli.main(['--trained_model', pth,
                           '--config', name,
                           '--ap_data_file', ap_file,
                           '--fast_nms', str(fast_nms),
                           '--no_bar'])
        our_maps = calc_map_from_file(cfg, ap_file)

        # meaningful signal: the overfit net must actually detect things
        assert ref_maps['box']['all'] > 1.0, ref_maps
        assert ref_maps['mask']['all'] > 1.0, ref_maps
        # the two full-pipeline tables agree bit-for-bit after rounding
        for t in ('box', 'mask'):
            for k, v in ref_maps[t].items():
                assert abs(our_maps[t][k] - v) < 1e-9, \
                    (t, k, v, our_maps[t][k], ref_maps, our_maps)
    finally:
        ref_config.cfg.replace(old_cfg)
