import jax.numpy as jnp
import numpy as np

from yolact_tpu import config as C
from yolact_tpu.detect.detection import detect
from yolact_tpu.detect.postprocess import postprocess_device
from yolact_tpu.ops.boxes import decode


def np_iou(a, b):
    ix = np.clip(np.minimum(a[:, None, 2], b[None, :, 2]) -
                 np.maximum(a[:, None, 0], b[None, :, 0]), 0, None)
    iy = np.clip(np.minimum(a[:, None, 3], b[None, :, 3]) -
                 np.maximum(a[:, None, 1], b[None, :, 1]), 0, None)
    inter = ix * iy
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (aa[:, None] + ab[None, :] - inter)


def reference_fast_nms(boxes, scores, conf_thresh, nms_thresh, top_k, max_dets):
    """Numpy emulation of the reference's dynamic-shape fast_nms
    (detection.py:82-180) for cross-checking the fixed-shape version."""
    conf_scores = scores.max(axis=0)
    keep = conf_scores > conf_thresh
    scores = scores[:, keep]
    boxes = boxes[keep]
    if scores.shape[1] == 0:
        return []
    order = np.argsort(-scores, axis=1, kind='stable')[:, :top_k]
    out = []
    for c in range(scores.shape[0]):
        idx = order[c]
        s = scores[c, idx]
        b = boxes[idx]
        iou = np_iou(b, b)
        iou = np.triu(iou, k=1)
        iou_max = iou.max(axis=0) if len(idx) else np.array([])
        for d in range(len(idx)):
            if iou_max[d] <= nms_thresh:
                out.append((c, s[d], tuple(np.round(b[d], 5))))
    out.sort(key=lambda t: -t[1])
    return out[:max_dets]


def test_fast_nms_matches_reference_emulation(rng):
    cfg = C.get_config('yolact_base').copy(num_classes=6)
    P, Cm1, Md = 400, 5, 8

    priors_xy = rng.rand(P, 2).astype(np.float32)
    priors_wh = (rng.rand(P, 2) * 0.2 + 0.05).astype(np.float32)
    priors = np.concatenate([priors_xy, priors_wh], axis=1)
    loc = (rng.randn(1, P, 4) * 0.5).astype(np.float32)
    conf = (rng.randn(1, P, Cm1 + 1) * 2).astype(np.float32)
    coeffs = rng.randn(1, P, Md).astype(np.float32)
    proto = rng.rand(1, 16, 16, Md).astype(np.float32)

    dets = detect(cfg, dict(loc=jnp.asarray(loc), conf=jnp.asarray(conf),
                            mask=jnp.asarray(coeffs),
                            priors=jnp.asarray(priors),
                            proto=jnp.asarray(proto)))

    # host-side reference
    e = np.exp(conf[0] - conf[0].max(axis=-1, keepdims=True))
    sm = e / e.sum(axis=-1, keepdims=True)
    scores_np = sm[:, 1:].T                       # [C-1, P]
    boxes_np = np.asarray(decode(jnp.asarray(loc[0]), jnp.asarray(priors)))
    want = reference_fast_nms(boxes_np, scores_np, cfg.nms_conf_thresh,
                              cfg.nms_thresh, cfg.nms_top_k,
                              cfg.max_num_detections)

    got_valid = np.asarray(dets.valid[0])
    got_scores = np.asarray(dets.scores[0])[got_valid]
    got_classes = np.asarray(dets.classes[0])[got_valid]
    got_boxes = np.asarray(dets.boxes[0])[got_valid]

    assert len(want) == got_valid.sum(), (len(want), got_valid.sum())
    np.testing.assert_allclose(got_scores, [w[1] for w in want], atol=1e-5)
    # compare (class, box) multisets in score order, tolerant to exact ties
    for i, (c, s, b) in enumerate(want):
        assert got_classes[i] == c
        np.testing.assert_allclose(got_boxes[i], b, atol=1e-4)


def test_detect_no_candidates():
    cfg = C.get_config('yolact_base').copy(num_classes=4)
    P = 50
    conf = np.zeros((1, P, 4), np.float32)
    conf[..., 0] = 20.0  # background wins everywhere
    dets = detect(cfg, dict(
        loc=jnp.zeros((1, P, 4)), conf=jnp.asarray(conf),
        mask=jnp.zeros((1, P, 8)),
        priors=jnp.asarray(np.full((P, 4), 0.5, np.float32)),
        proto=jnp.zeros((1, 8, 8, 8))))
    assert not bool(np.asarray(dets.valid).any())


def test_postprocess_device_masks(rng):
    cfg = C.get_config('yolact_base').copy(num_classes=4)
    B, D, Md, Hp = 1, cfg.max_num_detections, 8, 16
    from yolact_tpu.detect.detection import Detections
    proto = jnp.asarray(rng.rand(B, Hp, Hp, Md), jnp.float32)
    coeffs = jnp.asarray(rng.randn(B, D, Md), jnp.float32)
    boxes = jnp.tile(jnp.asarray([[0.2, 0.2, 0.8, 0.8]], jnp.float32), (D, 1))[None]
    dets = Detections(boxes, coeffs, jnp.zeros((B, D), jnp.int32),
                      jnp.full((B, D), 0.5), jnp.ones((B, D), bool), proto)
    masks, dets2 = postprocess_device(cfg, dets)
    assert masks.shape == (B, D, Hp, Hp)
    m = np.asarray(masks)
    assert (m >= 0).all() and (m <= 1).all()
    assert m[0, 0, 0, 0] == 0.0  # cropped corner
    # score threshold filters validity
    _, dets3 = postprocess_device(cfg, dets, score_threshold=0.6)
    assert not bool(np.asarray(dets3.valid).any())


def test_candidate_pruning_exact_when_few_candidates(rng):
    """nms_candidates pruning must not change results when fewer than N
    priors pass the confidence threshold."""
    cfg0 = C.get_config('yolact_base').copy(num_classes=6, nms_candidates=0)
    cfg1 = cfg0.copy(nms_candidates=64)
    P, Md = 500, 8
    priors = np.concatenate([rng.rand(P, 2), rng.rand(P, 2) * 0.2 + 0.05],
                            axis=1).astype(np.float32)
    # most priors confidently background => few candidates
    conf = np.zeros((1, P, 6), np.float32)
    conf[..., 0] = 8.0
    hot = rng.choice(P, 40, replace=False)
    conf[0, hot, 0] = 0.0
    conf[0, hot, 1 + (hot % 5)] = 6.0
    loc = (rng.randn(1, P, 4) * 0.3).astype(np.float32)
    coeffs = rng.randn(1, P, Md).astype(np.float32)
    proto = rng.rand(1, 16, 16, Md).astype(np.float32)
    preds = dict(loc=jnp.asarray(loc), conf=jnp.asarray(conf),
                 mask=jnp.asarray(coeffs), priors=jnp.asarray(priors),
                 proto=jnp.asarray(proto))
    d0 = detect(cfg0, preds)
    d1 = detect(cfg1, preds)
    np.testing.assert_array_equal(np.asarray(d0.valid), np.asarray(d1.valid))
    v = np.asarray(d0.valid[0])
    np.testing.assert_allclose(np.asarray(d0.scores[0])[v],
                               np.asarray(d1.scores[0])[v], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d0.boxes[0])[v],
                               np.asarray(d1.boxes[0])[v], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d0.classes[0])[v],
                                  np.asarray(d1.classes[0])[v])


def test_candidate_pruning_exact_when_crowded(rng):
    """When MORE than nms_candidates priors pass the confidence threshold
    (the case where pruning could drop real candidates), the runtime
    fallback must route the batch through the unpruned tail — results
    identical to nms_candidates=0 bit for bit."""
    cfg0 = C.get_config('yolact_base').copy(num_classes=6, nms_candidates=0)
    cfg1 = cfg0.copy(nms_candidates=64)
    P, Md = 500, 8
    priors = np.concatenate([rng.rand(P, 2), rng.rand(P, 2) * 0.2 + 0.05],
                            axis=1).astype(np.float32)
    # 200 > 64 priors confidently foreground => premise violated
    conf = np.zeros((1, P, 6), np.float32)
    conf[..., 0] = 8.0
    hot = rng.choice(P, 200, replace=False)
    conf[0, hot, 0] = 0.0
    conf[0, hot, 1 + (hot % 5)] = 6.0 + rng.rand(200).astype(np.float32)
    loc = (rng.randn(1, P, 4) * 0.3).astype(np.float32)
    coeffs = rng.randn(1, P, Md).astype(np.float32)
    proto = rng.rand(1, 16, 16, Md).astype(np.float32)
    preds = dict(loc=jnp.asarray(loc), conf=jnp.asarray(conf),
                 mask=jnp.asarray(coeffs), priors=jnp.asarray(priors),
                 proto=jnp.asarray(proto))
    d0 = detect(cfg0, preds)
    d1 = detect(cfg1, preds)
    np.testing.assert_array_equal(np.asarray(d0.valid), np.asarray(d1.valid))
    np.testing.assert_array_equal(np.asarray(d0.scores), np.asarray(d1.scores))
    np.testing.assert_array_equal(np.asarray(d0.boxes), np.asarray(d1.boxes))
    np.testing.assert_array_equal(np.asarray(d0.classes),
                                  np.asarray(d1.classes))
    np.testing.assert_array_equal(np.asarray(d0.masks), np.asarray(d1.masks))


def test_cc_fast_nms_matches_emulation(rng):
    """Class-collapsed fast NMS vs a numpy emulation (detection.py:111-135)."""
    cfg = C.get_config('yolact_base').copy(num_classes=6, nms_candidates=0)
    P, Md = 300, 8
    priors = np.concatenate([rng.rand(P, 2), rng.rand(P, 2) * 0.2 + 0.05],
                            axis=1).astype(np.float32)
    loc = (rng.randn(1, P, 4) * 0.5).astype(np.float32)
    conf = (rng.randn(1, P, 6) * 2).astype(np.float32)
    coeffs = rng.randn(1, P, Md).astype(np.float32)
    proto = rng.rand(1, 16, 16, Md).astype(np.float32)
    dets = detect(cfg, dict(loc=jnp.asarray(loc), conf=jnp.asarray(conf),
                            mask=jnp.asarray(coeffs),
                            priors=jnp.asarray(priors),
                            proto=jnp.asarray(proto)),
                  use_cross_class_nms=True)

    # emulation
    e = np.exp(conf[0] - conf[0].max(axis=-1, keepdims=True))
    sm = e / e.sum(axis=-1, keepdims=True)
    scores_np = sm[:, 1:].T
    boxes_np = np.asarray(decode(jnp.asarray(loc[0]), jnp.asarray(priors)))
    cand = scores_np.max(axis=0) > cfg.nms_conf_thresh
    best = np.where(cand, scores_np.max(axis=0), -1)
    order = np.argsort(-best, kind='stable')[:cfg.nms_top_k]
    b = boxes_np[order]
    iou = np.triu(np_iou(b, b), k=1)
    iou_max = iou.max(axis=0)
    kept = [(float(best[order[d]]), int(scores_np[:, order[d]].argmax()))
            for d in range(len(order))
            if iou_max[d] <= cfg.nms_thresh and best[order[d]] > 0]
    kept.sort(key=lambda t: -t[0])
    kept = kept[:cfg.max_num_detections]

    v = np.asarray(dets.valid[0])
    got_scores = np.asarray(dets.scores[0])[v]
    got_classes = np.asarray(dets.classes[0])[v]
    assert len(kept) == v.sum()
    np.testing.assert_allclose(got_scores, [s for s, c in kept], atol=1e-5)
    np.testing.assert_array_equal(got_classes, [c for s, c in kept])
