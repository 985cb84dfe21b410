import numpy as np
import pytest

from yolact_tpu.data import rle as R
from yolact_tpu.native import get_native


def test_rle_roundtrip(rng):
    for _ in range(5):
        h, w = rng.randint(5, 80), rng.randint(5, 80)
        mask = rng.rand(h, w) > 0.6
        enc = R.mask_to_rle(mask)
        dec = R.rle_to_mask(enc)
        np.testing.assert_array_equal(dec, mask)


def test_rle_counts_codec_matches_python(rng):
    """Native codec and numpy fallback must agree byte-for-byte."""
    native = get_native()
    if native is None:
        pytest.skip('native lib unavailable')
    for _ in range(5):
        counts = rng.randint(0, 10000, size=rng.randint(1, 50)).astype(np.uint32)
        enc_nat = native.rle_encode_counts(counts.astype(np.int64))
        # force python path
        import yolact_tpu.native as N
        saved = N._native
        try:
            N._native = None
            enc_py = R.encode_counts(counts)
            dec_py = R.decode_counts(enc_nat)
        finally:
            N._native = saved
        assert enc_nat == enc_py
        dec_nat = native.rle_decode_counts(enc_py)
        np.testing.assert_array_equal(dec_nat, counts)
        np.testing.assert_array_equal(dec_py, counts)


def test_rle_known_vector():
    """Empty-first-run convention: mask starting with 1s begins counts with 0."""
    mask = np.ones((3, 3), bool)
    enc = R.mask_to_rle(mask)
    counts = R.decode_counts(enc['counts'])
    assert counts[0] == 0 and counts[1] == 9


def test_uncompressed_rle():
    obj = {'size': [4, 3], 'counts': [2, 3, 7]}
    m = R.rle_to_mask(obj)
    flat = m.reshape(-1, order='F')
    np.testing.assert_array_equal(flat[:5], [0, 0, 1, 1, 1])
    assert flat[5:].sum() == 0


def test_polygon_mask():
    # A solid square from (2,2) to (8,8)
    m = R.polygons_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 12, 12)
    assert m[5, 5] and not m[0, 0] and not m[10, 10]


def np_greedy_nms(dets, thresh):
    x1, y1, x2, y2, sc = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = sc.argsort()[::-1]
    suppressed = np.zeros(len(dets), bool)
    keep = []
    for _i in range(len(order)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        for _j in range(_i + 1, len(order)):
            j = order[_j]
            if suppressed[j]:
                continue
            w = max(0.0, min(x2[i], x2[j]) - max(x1[i], x1[j]) + 1)
            h = max(0.0, min(y2[i], y2[j]) - max(y1[i], y1[j]) + 1)
            inter = w * h
            if inter / (areas[i] + areas[j] - inter) >= thresh:
                suppressed[j] = True
    return sorted(keep)


def test_native_greedy_nms(rng):
    native = get_native()
    if native is None:
        pytest.skip('native lib unavailable')
    for _ in range(5):
        n = 60
        xy = rng.rand(n, 2) * 300
        wh = rng.rand(n, 2) * 120 + 5
        dets = np.concatenate([xy, xy + wh, rng.rand(n, 1)], axis=1
                              ).astype(np.float32)
        keep = sorted(native.greedy_nms(dets, 0.5).tolist())
        assert keep == np_greedy_nms(dets, 0.5)


def test_bundled_native_source_in_sync():
    """The wheel-bundled copy of the native source must match the
    canonical native/yolact_native.cpp (single source of truth guard)."""
    import os
    import yolact_tpu.native as yn
    pkg = os.path.join(os.path.dirname(os.path.abspath(yn.__file__)),
                       '_src', 'yolact_native.cpp')
    repo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(yn.__file__)))),
        'native', 'yolact_native.cpp')
    with open(pkg, 'rb') as f1, open(repo, 'rb') as f2:
        assert f1.read() == f2.read(), \
            'yolact_tpu/native/_src/yolact_native.cpp is out of sync: ' \
            'cp native/yolact_native.cpp yolact_tpu/native/_src/'
