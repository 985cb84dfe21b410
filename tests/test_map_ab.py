"""mAP-risk burn-down A/B harness.

Runs the FULL dataset eval (forward -> detect -> postprocess -> greedy AP
matching -> calc_map) on a synthetic COCO set with trained-ish weights
(an overfit checkpoint, so detections are meaningful and mAP is non-zero),
and asserts the behavior-deviating knobs are mAP-free:

- ``nms_candidates`` pruning (0 = exact reference semantics vs 1024 fast
  path, plus a tiny N that forces the runtime crowded-batch fallback)
- bf16 vs f32 compute trunk

The pallas-vs-XLA mask assembly axis needs a TPU (the CPU platform always
takes the XLA path) — ``scripts/map_ab.py`` runs all axes on real
hardware with one command.

Pre-clears the knobs for the real-weights COCO run (NOTES.md: the two
deviating knobs flagged for the published-weights A/B).
"""

import json
import os
import sys

import cv2
import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _tiny import tiny_resnet_config
from test_eval import _write_tiny_coco


def overfit_variables(cfg, dataset, steps=200, lr=2e-3):
    """Overfit the model on the eval images themselves so eval produces
    confident, well-localised detections (random weights give mAP 0.00,
    which would make every A/B trivially pass)."""
    from yolact_tpu.train.step import create_train_state, train_step

    S = cfg.max_size
    items = [dataset.pull_item(i) for i in range(len(dataset))]
    B = len(items)
    G = max(it[1].shape[0] for it in items)
    images = np.stack([np.asarray(it[0]) for it in items])
    boxes = np.zeros((B, G, 4), np.float32)
    labels = np.full((B, G), -2, np.int32)
    masks = np.zeros((B, G, S, S), np.uint8)
    n_gts = np.zeros(B, np.int32)
    for b, it in enumerate(items):
        gt = np.asarray(it[1])
        n = gt.shape[0]
        boxes[b, :n] = gt[:, :4]
        labels[b, :n] = gt[:, 4].astype(np.int32)
        for g in range(n):
            masks[b, g] = cv2.resize(np.asarray(it[2][g], np.float32),
                                     (S, S)) > 0.5
        n_gts[b] = n
    batch = dict(image=images, gt_boxes=boxes, gt_labels=labels,
                 gt_masks=masks, num_gts=n_gts,
                 num_crowds=np.zeros(B, np.int32))

    train_cfg = cfg.copy(lr=lr, lr_warmup_until=0, freeze_bn=False)
    model, state = create_train_state(train_cfg, seed=0)
    step = jax.jit(lambda s, b, r: train_step(train_cfg, model, s, b, r))
    key = jax.random.PRNGKey(0)
    for i in range(steps):
        key, sk = jax.random.split(key)
        state, losses = step(state, batch, sk)
    assert np.isfinite(float(losses['total'])), losses
    return {'params': state.params['model'], 'batch_stats': state.batch_stats}


@pytest.fixture(scope='module')
def trained_eval_setup(tmp_path_factory):
    from yolact_tpu.eval.evaluate import make_eval_dataset
    tmp = tmp_path_factory.mktemp('map_ab')
    img_dir, json_path = _write_tiny_coco(tmp)
    cfg = tiny_resnet_config()
    cfg = cfg.copy(dataset=cfg.dataset.copy(
        valid_images=img_dir, valid_info=json_path,
        class_names=('thing', 'b', 'c', 'd'), label_map=None))
    dataset = make_eval_dataset(cfg)
    variables = overfit_variables(cfg, dataset)
    return cfg, dataset, variables


def _run(cfg, dataset, variables, **kw):
    from yolact_tpu.eval.evaluate import evaluate_dataset
    return evaluate_dataset(cfg, variables, dataset, quiet=True,
                            device_mask_iou=False, **kw)


def test_overfit_produces_real_map(trained_eval_setup):
    cfg, dataset, variables = trained_eval_setup
    maps = _run(cfg, dataset, variables)
    # trained-ish weights: the A/B below is only meaningful if eval
    # actually matches detections to gt
    assert maps['box']['all'] > 10, maps['box']
    assert maps['mask']['all'] > 10, maps['mask']


def test_nms_candidates_map_identical(trained_eval_setup):
    """Pruned fast path (premise holds) and forced crowded fallback both
    reproduce the exact path's mAP table bit for bit."""
    cfg, dataset, variables = trained_eval_setup
    exact = _run(cfg.copy(nms_candidates=0), dataset, variables)
    pruned = _run(cfg.copy(nms_candidates=1024), dataset, variables)
    fallback = _run(cfg.copy(nms_candidates=8), dataset, variables)
    print('\nmAP A/B (nms_candidates): exact=%r pruned=%r fallback=%r'
          % (exact['mask']['all'], pruned['mask']['all'],
             fallback['mask']['all']))
    assert exact == pruned
    assert exact == fallback


def test_bf16_trunk_map_close(trained_eval_setup):
    """bf16 compute trunk vs f32: the eval default on TPU.  Asserts the
    mAP delta is within noise on the synthetic set and prints the table
    for the record."""
    cfg, dataset, variables = trained_eval_setup
    f32 = _run(cfg.copy(compute_dtype='float32'), dataset, variables)
    bf16 = _run(cfg.copy(compute_dtype='bfloat16'), dataset, variables)
    print('\nmAP A/B (dtype): f32=%s bf16=%s'
          % (json.dumps({k: v['all'] for k, v in f32.items()}),
             json.dumps({k: v['all'] for k, v in bf16.items()})))
    for t in ('box', 'mask'):
        assert abs(f32[t]['all'] - bf16[t]['all']) <= 2.0, (t, f32[t], bf16[t])
