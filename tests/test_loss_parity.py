"""Matcher + MultiBoxLoss numerical parity against the reference (oracle).

Feeds identical random predictions/targets to the reference torch loss and
our vectorised JAX loss and compares per-letter values.  Sub-sampling paths
are avoided by keeping num_pos <= masks_to_train so both sides are
deterministic.
"""

import numpy as np
import pytest

import _refutil

pytestmark = pytest.mark.skipif(not _refutil.available(),
                                reason='reference repo not available')
torch = pytest.importorskip('torch')


@pytest.fixture(scope='module')
def ref():
    return _refutil.import_reference()


def make_tiny_ref_cfg(ref_config):
    cfg = ref_config.yolact_base_config.copy({
        'num_classes': 5,
        'max_size': 128,
        'masks_to_train': 100,
    })
    ref_config.cfg.replace(cfg)
    return ref_config.cfg


def tiny_cfg():
    from yolact_tpu.config import get_config
    return get_config('yolact_base').copy(num_classes=5, max_size=128,
                                          masks_to_train=100)


def random_scene(rng, P=120, G=5, C=5, Md=8, Hp=24, S=128, crowds=1):
    """Random but consistent inputs for both implementations."""
    priors_xy = rng.rand(P, 2).astype(np.float32)
    priors_wh = (rng.rand(P, 2) * 0.3 + 0.08).astype(np.float32)
    priors = np.concatenate([priors_xy, priors_wh], axis=1)

    xy1 = rng.rand(G, 2).astype(np.float32) * 0.5
    wh = (rng.rand(G, 2) * 0.4 + 0.1).astype(np.float32)
    gt_boxes = np.concatenate([xy1, xy1 + wh], axis=1)
    gt_labels = rng.randint(0, C - 1, size=G).astype(np.float32)
    if crowds:
        gt_labels[-crowds:] = -1

    loc = (rng.randn(1, P, 4) * 0.3).astype(np.float32)
    conf = (rng.randn(1, P, C) * 2).astype(np.float32)
    coeffs = np.tanh(rng.randn(1, P, Md)).astype(np.float32)
    proto = np.abs(rng.randn(1, Hp, Hp, Md)).astype(np.float32)
    gt_masks = (rng.rand(G, S, S) > 0.55).astype(np.float32)
    segm = (rng.randn(1, C - 1, 33, 33) * 2).astype(np.float32)
    return dict(priors=priors, gt_boxes=gt_boxes, gt_labels=gt_labels,
                loc=loc, conf=conf, coeffs=coeffs, proto=proto,
                gt_masks=gt_masks, segm=segm, crowds=crowds)


def run_reference_loss(ref, sc):
    ref_yolact, ref_config, ref_box_utils, ref_mbl = ref
    cfg = make_tiny_ref_cfg(ref_config)

    criterion = ref_mbl.MultiBoxLoss(num_classes=5,
                                     pos_threshold=cfg.positive_iou_threshold,
                                     neg_threshold=cfg.negative_iou_threshold,
                                     negpos_ratio=cfg.ohem_negpos_ratio)
    predictions = {
        'loc': torch.from_numpy(sc['loc']),
        'conf': torch.from_numpy(sc['conf']),
        'mask': torch.from_numpy(sc['coeffs']),
        'priors': torch.from_numpy(sc['priors']),
        'proto': torch.from_numpy(sc['proto']),
        'segm': torch.from_numpy(sc['segm']),
    }
    target = np.concatenate([sc['gt_boxes'], sc['gt_labels'][:, None]],
                            axis=1)
    targets = [torch.from_numpy(target)]
    masks = [torch.from_numpy(sc['gt_masks'])]
    losses = criterion(None, predictions, targets, masks, [sc['crowds']])
    return {k: float(v) for k, v in losses.items()}


def run_our_loss(sc):
    import jax
    from yolact_tpu.train.loss import multibox_loss

    cfg = tiny_cfg()
    G = sc['gt_boxes'].shape[0]
    predictions = {
        'loc': sc['loc'], 'conf': sc['conf'], 'mask': sc['coeffs'],
        'priors': sc['priors'], 'proto': sc['proto'],
        # our segm is NHWC
        'segm': np.transpose(sc['segm'], (0, 2, 3, 1)),
    }
    batch = dict(
        gt_boxes=sc['gt_boxes'][None],
        gt_labels=sc['gt_labels'][None].astype(np.int32),
        gt_masks=sc['gt_masks'][None],
        num_gts=np.array([G], np.int32),
        num_crowds=np.array([sc['crowds']], np.int32))
    losses, m = multibox_loss(cfg, jax.random.PRNGKey(0), predictions, batch)
    return {k: float(v) for k, v in losses.items()}, m


def run_reference_match(ref, sc):
    ref_yolact, ref_config, ref_box_utils, _ = ref
    cfg = make_tiny_ref_cfg(ref_config)
    G = sc['gt_boxes'].shape[0]
    nc = sc['crowds']
    truths = torch.from_numpy(sc['gt_boxes'][:G - nc])
    labels = torch.from_numpy(sc['gt_labels'][:G - nc]).long()
    crowd_boxes = torch.from_numpy(sc['gt_boxes'][G - nc:]) if nc else None
    P = sc['priors'].shape[0]
    loc_t = torch.zeros(1, P, 4)
    conf_t = torch.zeros(1, P).long()
    idx_t = torch.zeros(1, P).long()
    ref_box_utils.match(cfg.positive_iou_threshold, cfg.negative_iou_threshold,
                        truths, torch.from_numpy(sc['priors']), labels,
                        crowd_boxes, loc_t, conf_t, idx_t, 0,
                        torch.from_numpy(sc['loc'][0]))
    return (loc_t[0].numpy(), conf_t[0].numpy(), idx_t[0].numpy())


def test_matcher_parity(ref):
    from yolact_tpu.train.matcher import match as our_match
    cfg = tiny_cfg()
    for seed in range(4):
        rng = np.random.RandomState(seed)
        sc = random_scene(rng, crowds=1 if seed % 2 else 0)
        ref_loc, ref_conf, ref_idx = run_reference_match(ref, sc)
        m = our_match(cfg, sc['gt_boxes'][None],
                      sc['gt_labels'][None].astype(np.int32), sc['priors'])
        np.testing.assert_array_equal(np.asarray(m.conf_t[0]), ref_conf,
                                      err_msg=f'seed {seed} conf_t')
        # idx_t only meaningful where a positive/neutral match exists
        mask = ref_conf != 0
        np.testing.assert_array_equal(np.asarray(m.idx_t[0])[mask],
                                      ref_idx[mask], err_msg=f'seed {seed}')
        np.testing.assert_allclose(np.asarray(m.loc_t[0]), ref_loc,
                                   atol=1e-4, err_msg=f'seed {seed}')


def test_loss_parity(ref):
    for seed in (0, 3):
        rng = np.random.RandomState(seed)
        sc = random_scene(rng, crowds=1 if seed else 0)
        want = run_reference_loss(ref, sc)
        got, _ = run_our_loss(sc)
        for k in ('B', 'C', 'S', 'M'):
            assert k in want and k in got, (k, want.keys(), got.keys())
            np.testing.assert_allclose(
                got[k], want[k], rtol=2e-3,
                err_msg=f'loss {k} seed {seed}: ref={want[k]} ours={got[k]}')


@pytest.mark.parametrize('mode', ['focal', 'focal_objectness', 'objectness'])
def test_conf_loss_variants_parity(ref, mode):
    """Focal / objectness confidence-loss variants vs the reference.

    (The reference's sigmoid-focal path calls torch.eye(device=-1) on CPU
    and cannot run outside CUDA, so it is covered by our own unit math
    only.)
    """
    ref_yolact, ref_config, ref_box_utils, ref_mbl = ref
    flags = {
        'focal': dict(use_focal_loss=True),
        'focal_objectness': dict(use_focal_loss=True,
                                 use_objectness_score=True),
        'objectness': dict(use_objectness_score=True),
    }[mode]

    rng = np.random.RandomState(11)
    sc = random_scene(rng, crowds=0)

    # reference
    cfg_ref = make_tiny_ref_cfg(ref_config)
    ref_config.cfg.replace(ref_config.cfg.copy(flags))
    try:
        want = run_reference_loss(ref, sc)
        # run_reference_loss resets cfg; re-apply flags and rerun
        ref_config.cfg.replace(ref_config.cfg.copy(flags))
        want = run_reference_loss2(ref, sc, flags)
    finally:
        ref_config.cfg.replace(ref_config.yolact_base_config)

    import jax
    from yolact_tpu.train.loss import multibox_loss
    cfg = tiny_cfg().copy(**flags)
    G = sc['gt_boxes'].shape[0]
    predictions = {
        'loc': sc['loc'], 'conf': sc['conf'], 'mask': sc['coeffs'],
        'priors': sc['priors'], 'proto': sc['proto'],
        'segm': np.transpose(sc['segm'], (0, 2, 3, 1)),
    }
    batch = dict(
        gt_boxes=sc['gt_boxes'][None],
        gt_labels=sc['gt_labels'][None].astype(np.int32),
        gt_masks=sc['gt_masks'][None],
        num_gts=np.array([G], np.int32),
        num_crowds=np.array([0], np.int32))
    got, _ = multibox_loss(cfg, jax.random.PRNGKey(0), predictions, batch)
    np.testing.assert_allclose(
        float(got['C']), want['C'], rtol=2e-3,
        err_msg=f'{mode}: ref={want["C"]} ours={float(got["C"])}')


def run_reference_loss2(ref, sc, flags):
    """Like run_reference_loss but with extra cfg flags applied."""
    ref_yolact, ref_config, ref_box_utils, ref_mbl = ref
    cfg = make_tiny_ref_cfg(ref_config)
    ref_config.cfg.replace(ref_config.cfg.copy(flags))
    criterion = ref_mbl.MultiBoxLoss(num_classes=5,
                                     pos_threshold=cfg.positive_iou_threshold,
                                     neg_threshold=cfg.negative_iou_threshold,
                                     negpos_ratio=cfg.ohem_negpos_ratio)
    predictions = {
        'loc': torch.from_numpy(sc['loc']),
        'conf': torch.from_numpy(sc['conf']),
        'mask': torch.from_numpy(sc['coeffs']),
        'priors': torch.from_numpy(sc['priors']),
        'proto': torch.from_numpy(sc['proto']),
        'segm': torch.from_numpy(sc['segm']),
    }
    target = np.concatenate([sc['gt_boxes'], sc['gt_labels'][:, None]],
                            axis=1)
    losses = criterion(None, predictions, [torch.from_numpy(target)],
                       [torch.from_numpy(sc['gt_masks'])], [sc['crowds']])
    return {k: float(v) for k, v in losses.items()}


@pytest.mark.parametrize('flags', [
    dict(mask_proto_double_loss=True),
    dict(mask_proto_reweight_mask_loss=True),
    dict(mask_proto_remove_empty_masks=True),
    dict(mask_proto_normalize_mask_loss_by_sqrt_area=True,
         mask_proto_normalize_emulate_roi_pooling=False),
])
def test_mask_loss_flag_variants_parity(ref, flags):
    """Rare mask-loss flags vs the reference."""
    rng = np.random.RandomState(21)
    sc = random_scene(rng, crowds=0)
    want = run_reference_loss2(ref, sc, flags)

    import jax
    from yolact_tpu.train.loss import multibox_loss
    cfg = tiny_cfg().copy(**flags)
    G = sc['gt_boxes'].shape[0]
    predictions = {
        'loc': sc['loc'], 'conf': sc['conf'], 'mask': sc['coeffs'],
        'priors': sc['priors'], 'proto': sc['proto'],
        'segm': np.transpose(sc['segm'], (0, 2, 3, 1)),
    }
    batch = dict(
        gt_boxes=sc['gt_boxes'][None],
        gt_labels=sc['gt_labels'][None].astype(np.int32),
        gt_masks=sc['gt_masks'][None],
        num_gts=np.array([G], np.int32),
        num_crowds=np.array([0], np.int32))
    got, _ = multibox_loss(cfg, jax.random.PRNGKey(0), predictions, batch)
    np.testing.assert_allclose(
        float(got['M']), want['M'], rtol=5e-3,
        err_msg=f'{flags}: ref={want["M"]} ours={float(got["M"])}')


def test_matcher_segmented_topk_ties():
    """Exercises the multi-segment top-k path (P >> seg) with quantized
    coordinates so IoU ties are common: must match a naive numpy greedy
    matcher bit-for-bit (ties resolve to the lowest prior index,
    box_utils.py:189-207 argmax semantics)."""
    from yolact_tpu.ops.boxes import jaccard, point_form
    from yolact_tpu.train.matcher import match as our_match
    import jax.numpy as jnp

    cfg = tiny_cfg()
    rng = np.random.RandomState(7)
    P, G = 2048, 12
    # quantized grid -> many identical boxes -> exact IoU ties
    priors_xy = (rng.randint(0, 8, (P, 2)) / 8.0 + 0.0625).astype(np.float32)
    priors_wh = (rng.randint(1, 4, (P, 2)) / 8.0).astype(np.float32)
    priors = np.concatenate([priors_xy, priors_wh], 1)
    xy1 = (rng.randint(0, 6, (G, 2)) / 8.0).astype(np.float32)
    wh = (rng.randint(1, 3, (G, 2)) / 8.0).astype(np.float32)
    gt_boxes = np.concatenate([xy1, xy1 + wh], 1)
    gt_labels = rng.randint(0, 4, G).astype(np.int32)
    # one gt guaranteed to overlap nothing (zero-size corner box): the
    # greedy loop must force-match it to the lowest-index tied prior
    gt_boxes[-1] = [0.999, 0.999, 1.0, 1.0]

    ov = np.asarray(jaccard(jnp.asarray(gt_boxes),
                            point_form(jnp.asarray(priors))))
    bto = ov.max(axis=0)
    bti = ov.argmax(axis=0)
    ovm = ov.copy()
    for _ in range(G):
        j = ovm.max(axis=1).argmax()
        if ovm[j].max() <= -0.5:
            continue
        i = ovm[j].argmax()
        ovm[:, i] = -1
        ovm[j, :] = -1
        bto[i] = 2
        bti[i] = j

    m = our_match(cfg, gt_boxes[None], gt_labels[None], priors)
    conf = gt_labels[bti] + 1
    conf = np.where(bto < cfg.positive_iou_threshold, -1, conf)
    conf = np.where(bto < cfg.negative_iou_threshold, 0, conf)
    np.testing.assert_array_equal(np.asarray(m.conf_t[0]), conf)
    mask = conf != 0
    np.testing.assert_array_equal(np.asarray(m.idx_t[0])[mask], bti[mask])


@pytest.mark.parametrize('variant', ['change', 'prediction'])
def test_matcher_variant_parity(ref, variant):
    """use_change_matching / use_prediction_matching vs the reference
    (box_utils.py:178-181) — the rarely-exercised matching modes."""
    from yolact_tpu.train.matcher import match as our_match
    ref_yolact, ref_config, ref_box_utils, _ = ref
    flags = {'change': {'use_change_matching': True},
             'prediction': {'use_prediction_matching': True}}[variant]
    try:
        for seed in range(2):
            rng = np.random.RandomState(seed)
            sc = random_scene(rng, crowds=0)
            ref_cfg = ref_config.yolact_base_config.copy(
                {'num_classes': 5, 'max_size': 128, 'masks_to_train': 100,
                 **flags})
            ref_config.cfg.replace(ref_cfg)
            G = sc['gt_boxes'].shape[0]
            P = sc['priors'].shape[0]
            loc_t = torch.zeros(1, P, 4)
            conf_t = torch.zeros(1, P).long()
            idx_t = torch.zeros(1, P).long()
            ref_box_utils.match(
                ref_cfg.positive_iou_threshold,
                ref_cfg.negative_iou_threshold,
                torch.from_numpy(sc['gt_boxes']),
                torch.from_numpy(sc['priors']),
                torch.from_numpy(sc['gt_labels']).long(), None,
                loc_t, conf_t, idx_t, 0, torch.from_numpy(sc['loc'][0]))

            cfg = tiny_cfg().copy(**flags)
            m = our_match(cfg, sc['gt_boxes'][None],
                          sc['gt_labels'][None].astype(np.int32),
                          sc['priors'], loc_pred=sc['loc'])
            np.testing.assert_array_equal(np.asarray(m.conf_t[0]),
                                          conf_t[0].numpy(),
                                          err_msg=f'{variant} seed {seed}')
            mask = conf_t[0].numpy() != 0
            np.testing.assert_array_equal(np.asarray(m.idx_t[0])[mask],
                                          idx_t[0].numpy()[mask],
                                          err_msg=f'{variant} seed {seed}')
            np.testing.assert_allclose(np.asarray(m.loc_t[0]),
                                       loc_t[0].numpy(),
                                       atol=1e-4, err_msg=f'{variant} {seed}')
    finally:
        # the reference cfg is a module-global shared across test files
        ref_config.cfg.replace(ref_config.yolact_base_config)
