import jax.numpy as jnp
import numpy as np

from yolact_tpu.ops import boxes as B


def rand_boxes(rng, n):
    """Random valid point-form boxes in [0,1]."""
    xy1 = rng.rand(n, 2) * 0.6
    wh = rng.rand(n, 2) * 0.35 + 0.02
    return np.concatenate([xy1, xy1 + wh], axis=1).astype(np.float32)


def iou_ref(a, b):
    """Straightforward numpy IoU for cross-checking."""
    out = np.zeros((len(a), len(b)), np.float64)
    for i, ba in enumerate(a):
        for j, bb in enumerate(b):
            ix = max(0, min(ba[2], bb[2]) - max(ba[0], bb[0]))
            iy = max(0, min(ba[3], bb[3]) - max(ba[1], bb[1]))
            inter = ix * iy
            ua = (ba[2] - ba[0]) * (ba[3] - ba[1])
            ub = (bb[2] - bb[0]) * (bb[3] - bb[1])
            out[i, j] = inter / (ua + ub - inter)
    return out


def test_point_center_roundtrip(rng):
    b = rand_boxes(rng, 50)
    back = np.asarray(B.point_form(B.center_size(jnp.asarray(b))))
    np.testing.assert_allclose(back, b, atol=1e-6)


def test_jaccard_matches_naive(rng):
    a, b = rand_boxes(rng, 13), rand_boxes(rng, 7)
    got = np.asarray(B.jaccard(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, iou_ref(a, b), atol=1e-5)


def test_jaccard_crowd_mode(rng):
    a, b = rand_boxes(rng, 5), rand_boxes(rng, 4)
    got = np.asarray(B.jaccard(jnp.asarray(a), jnp.asarray(b), iscrowd=True))
    inter = np.asarray(B.intersect(jnp.asarray(a), jnp.asarray(b)))
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    np.testing.assert_allclose(got, inter / area_a[:, None], atol=1e-6)


def test_jaccard_batched(rng):
    a = np.stack([rand_boxes(rng, 6), rand_boxes(rng, 6)])
    b = np.stack([rand_boxes(rng, 9), rand_boxes(rng, 9)])
    got = np.asarray(B.jaccard(jnp.asarray(a), jnp.asarray(b)))
    for k in range(2):
        np.testing.assert_allclose(got[k], iou_ref(a[k], b[k]), atol=1e-5)


def test_encode_decode_roundtrip(rng):
    matched = rand_boxes(rng, 64)
    priors = np.asarray(B.center_size(jnp.asarray(rand_boxes(rng, 64))))
    for yolo in (False, True):
        enc = B.encode(jnp.asarray(matched), jnp.asarray(priors), yolo)
        dec = np.asarray(B.decode(enc, jnp.asarray(priors), yolo))
        np.testing.assert_allclose(dec, matched, atol=1e-4)


def test_decode_known_value():
    # loc = 0 must decode to the prior itself in point form
    priors = jnp.asarray([[0.5, 0.5, 0.2, 0.4]], jnp.float32)
    dec = np.asarray(B.decode(jnp.zeros((1, 4)), priors))
    np.testing.assert_allclose(dec, [[0.4, 0.3, 0.6, 0.7]], atol=1e-6)


def test_sanitize_coordinates():
    x1 = jnp.asarray([0.8, -0.1, 0.3])
    x2 = jnp.asarray([0.2, 0.5, 0.9])
    lo, hi = B.sanitize_coordinates(x1, x2, 100, padding=1, cast=False)
    np.testing.assert_allclose(np.asarray(lo), [19, 0, 29], atol=1e-5)
    np.testing.assert_allclose(np.asarray(hi), [81, 51, 91], atol=1e-5)
    lo, hi = B.sanitize_coordinates(x1, x2, 100, padding=0, cast=True)
    assert np.asarray(lo).min() >= 0 and np.asarray(hi).max() <= 100


def test_crop_zeroes_outside_box():
    h = w = 16
    masks = jnp.ones((h, w, 2), jnp.float32)
    boxes = jnp.asarray([[0.25, 0.25, 0.75, 0.75], [0.0, 0.0, 1.0, 1.0]])
    out = np.asarray(B.crop(masks, boxes, padding=0))
    assert out[0, 0, 0] == 0 and out[8, 8, 0] == 1
    np.testing.assert_allclose(out[..., 1], 1.0)
    # padding=1 expands the window by one pixel each side
    outp = np.asarray(B.crop(masks, boxes, padding=1))
    assert outp[3, 3, 0] == 1 and outp[2, 2, 0] == 0


def test_mask_iou(rng):
    a = (rng.rand(3, 8, 8) > 0.5).astype(np.float32)
    b = (rng.rand(4, 8, 8) > 0.5).astype(np.float32)
    got = np.asarray(B.mask_iou(jnp.asarray(a), jnp.asarray(b)))
    for i in range(3):
        for j in range(4):
            inter = (a[i] * b[j]).sum()
            union = a[i].sum() + b[j].sum() - inter
            np.testing.assert_allclose(got[i, j], inter / union, atol=1e-5)
