"""Oracle test: our fixed-shape detect() vs the reference Detect
(layers/functions/detection.py) with fast_nms / cc_fast_nms."""

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


def _scene(seed, P=600, C=6, Md=8):
    rng = np.random.RandomState(seed)
    loc = (rng.randn(1, P, 4) * 0.3).astype(np.float32)
    conf = (rng.randn(1, P, C) * 2.0).astype(np.float32)
    coeffs = rng.randn(1, P, Md).astype(np.float32)
    pxy = rng.rand(P, 2).astype(np.float32) * 0.8 + 0.1
    pwh = (rng.rand(P, 2) * 0.2 + 0.05).astype(np.float32)
    priors = np.concatenate([pxy, pwh], 1)
    proto = rng.rand(1, 16, 16, Md).astype(np.float32)
    return loc, conf, coeffs, priors, proto


@pytest.mark.parametrize('cross_class', [False, True])
def test_detect_fast_nms_oracle(ref, cross_class):
    import torch
    ref_yolact, ref_config, _, _ = ref
    from layers.functions.detection import Detect as RefDetect

    from yolact_tpu.config import get_config
    from yolact_tpu.detect.detection import detect as our_detect

    C, D = 6, 20
    cfg = get_config('yolact_base').copy(
        num_classes=C, max_num_detections=D, nms_candidates=0)
    ref_config.cfg.replace(ref_config.yolact_base_config.copy(
        {'num_classes': C, 'max_num_detections': D}))
    try:
        for seed in range(5):
            loc, conf, coeffs, priors, proto = _scene(seed)
            sm = torch.softmax(torch.from_numpy(conf), dim=-1)
            rd = RefDetect(C, bkg_label=0, top_k=cfg.nms_top_k,
                           conf_thresh=cfg.nms_conf_thresh,
                           nms_thresh=cfg.nms_thresh)
            rd.use_fast_nms = True
            rd.use_cross_class_nms = cross_class
            out = rd({'loc': torch.from_numpy(loc), 'conf': sm,
                      'mask': torch.from_numpy(coeffs),
                      'priors': torch.from_numpy(priors),
                      'proto': torch.from_numpy(proto)}, None)
            r = out[0]['detection']

            ours = our_detect(cfg, {'loc': loc, 'conf': conf,
                                    'mask': coeffs, 'priors': priors,
                                    'proto': proto},
                              use_fast_nms=True,
                              use_cross_class_nms=cross_class)
            valid = np.asarray(ours.valid[0])
            n = int(valid.sum())
            assert valid[:n].all(), 'valid entries must be a prefix'
            ob = np.asarray(ours.boxes[0])[:n]
            oc = np.asarray(ours.classes[0])[:n]
            os_ = np.asarray(ours.scores[0])[:n]
            om = np.asarray(ours.masks[0])[:n]

            if r is None:
                assert n == 0
                continue
            rb = r['box'].numpy()
            rc = r['class'].numpy()
            rs = r['score'].numpy()
            rm = r['mask'].numpy()
            if cross_class:
                # the reference cc path returns ALL survivors (score-
                # sorted, uncapped); our fixed-shape output keeps the
                # top max_num_detections — compare against its prefix
                rb, rc, rs, rm = rb[:D], rc[:D], rs[:D], rm[:D]
            assert n == len(rs), f'seed {seed}: {n} vs {len(rs)} dets'
            np.testing.assert_array_equal(oc, rc, err_msg=f'seed {seed}')
            np.testing.assert_allclose(os_, rs, atol=1e-5,
                                       err_msg=f'seed {seed}')
            np.testing.assert_allclose(ob, rb, atol=1e-5,
                                       err_msg=f'seed {seed}')
            np.testing.assert_allclose(om, rm, atol=1e-5,
                                       err_msg=f'seed {seed}')
    finally:
        ref_config.cfg.replace(ref_config.yolact_base_config)
