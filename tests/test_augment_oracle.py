"""Shared-random-stream oracle tests: our augmentation stages vs the
reference's (utils/augmentations.py).

The reference binds ``from numpy import random`` as a module attribute, so
we patch ``ref_aug.random`` with a shim over a seeded RandomState whose
call sequence matches our implementation's draws one-for-one (randint /
uniform / choice-as-indexed-randint).  With both sides consuming identical
streams, outputs must match exactly (same numpy/cv2 ops).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _refutil import import_reference


class _RandShim:
    """numpy.random-module stand-in backed by a RandomState; choice()
    consumes one randint(len) like our implementations do."""

    def __init__(self, seed):
        self._r = np.random.RandomState(seed)

    def randint(self, *a, **k):
        return self._r.randint(*a, **k)

    def uniform(self, *a, **k):
        return self._r.uniform(*a, **k)

    def choice(self, options):
        return options[self._r.randint(len(options))]


@pytest.fixture(scope='module')
def ref_aug(ref):
    import utils.augmentations as ra
    return ra


@pytest.fixture(scope='module')
def ref():
    try:
        return import_reference()
    except Exception as e:          # pragma: no cover
        pytest.skip(f'reference unavailable: {e}')


def _scene(seed, n=4, h=60, w=80, crowds=1):
    rng = np.random.RandomState(seed)
    image = (rng.rand(h, w, 3) * 255).astype(np.float32)
    masks = (rng.rand(n, h, w) > 0.5).astype(np.float32)
    xy1 = rng.rand(n, 2) * [w * 0.5, h * 0.5]
    wh = rng.rand(n, 2) * [w * 0.4, h * 0.4] + 4
    boxes = np.concatenate([xy1, xy1 + wh], 1).astype(np.float32)
    labels = np.concatenate([rng.randint(0, 5, n - crowds),
                             -np.ones(crowds)]).astype(np.float64)
    return image, masks, boxes, {'labels': labels, 'num_crowds': crowds}


def test_expand_oracle(ref_aug):
    from yolact_tpu.data.augmentations import _expand
    mean = (103.94, 116.78, 123.68)
    for seed in range(6):
        image, masks, boxes, labels = _scene(seed)
        ref_aug.random = _RandShim(seed)
        ri, rm, rb, _ = ref_aug.Expand(mean)(
            image.copy(), masks.copy(), boxes.copy(), dict(labels))
        oi, om, ob = _expand(np.random.RandomState(seed), image.copy(),
                             masks.copy(), boxes.copy(), mean)
        np.testing.assert_array_equal(oi, ri, err_msg=f'seed {seed}')
        np.testing.assert_array_equal(om, rm)
        np.testing.assert_array_equal(ob, rb)


def test_random_sample_crop_oracle(ref_aug):
    from yolact_tpu.data.augmentations import _random_sample_crop
    for seed in range(8):
        image, masks, boxes, labels = _scene(seed)
        ref_aug.random = _RandShim(seed)
        ri, rm, rb, rl = ref_aug.RandomSampleCrop()(
            image.copy(), masks.copy(), boxes.copy(),
            dict(labels, labels=labels['labels'].copy()))
        oi, om, ob, ol = _random_sample_crop(
            np.random.RandomState(seed), image.copy(), masks.copy(),
            boxes.copy(), dict(labels, labels=labels['labels'].copy()))
        np.testing.assert_array_equal(oi, ri, err_msg=f'seed {seed}')
        np.testing.assert_array_equal(om, rm, err_msg=f'seed {seed}')
        np.testing.assert_array_equal(ob, rb, err_msg=f'seed {seed}')
        np.testing.assert_array_equal(ol['labels'], rl['labels'])
        assert int(ol['num_crowds']) == int(rl['num_crowds'])


def test_photometric_oracle(ref_aug):
    from yolact_tpu.data.augmentations import _photometric_distort
    for seed in range(8):
        image, masks, boxes, labels = _scene(seed)
        ref_aug.random = _RandShim(seed)
        ri, _, _, _ = ref_aug.PhotometricDistort()(
            image.copy(), masks, boxes, labels)
        oi = _photometric_distort(np.random.RandomState(seed), image.copy())
        np.testing.assert_allclose(oi, ri, rtol=0, atol=1e-4,
                                   err_msg=f'seed {seed}')


def test_mirror_flip_rot90_oracle(ref_aug):
    from yolact_tpu.data.augmentations import (_random_flip, _random_mirror,
                                               _random_rot90)
    pairs = [(ref_aug.RandomMirror(), _random_mirror),
             (ref_aug.RandomFlip(), _random_flip),
             (ref_aug.RandomRot90(), _random_rot90)]
    for seed in range(4):
        for ref_t, ours in pairs:
            image, masks, boxes, labels = _scene(seed)
            ref_aug.random = _RandShim(seed)
            ri, rm, rb, _ = ref_t(image.copy(), masks.copy(), boxes.copy(),
                                  labels)
            oi, om, ob = ours(np.random.RandomState(seed), image.copy(),
                              masks.copy(), boxes.copy())
            np.testing.assert_array_equal(oi, ri,
                                          err_msg=f'{ours.__name__} {seed}')
            np.testing.assert_array_equal(om, rm)
            np.testing.assert_array_equal(ob, rb)


def test_resize_discard_oracle(ref, ref_aug):
    """Resize + tiny-box discard vs the reference (reads the reference's
    global cfg for max_size / discard thresholds)."""
    from yolact_tpu.config import get_config
    from yolact_tpu.data.augmentations import _resize_and_discard
    _, ref_config, _, _ = ref
    cfg = get_config('yolact_base').copy(max_size=128)
    try:
        for preserve in (False, True):
            ref_config.cfg.replace(ref_config.yolact_base_config.copy(
                {'max_size': 128, 'preserve_aspect_ratio': preserve}))
            ours_cfg = cfg.copy(preserve_aspect_ratio=preserve)
            for seed in range(4):
                image, masks, boxes, labels = _scene(seed)
                ri, rm, rb, rl = ref_aug.Resize(resize_gt=True)(
                    image.copy(), masks.copy(), boxes.copy(),
                    dict(labels, labels=labels['labels'].copy()))
                oi, om, ob, ol = _resize_and_discard(
                    ours_cfg, image.copy(), masks.copy(), boxes.copy(),
                    dict(labels, labels=labels['labels'].copy()))
                np.testing.assert_array_equal(oi, ri, err_msg=f's{seed}')
                np.testing.assert_array_equal(om, rm)
                np.testing.assert_array_equal(ob, rb)
                np.testing.assert_array_equal(ol['labels'], rl['labels'])
                assert int(ol['num_crowds']) == int(rl['num_crowds'])
    finally:
        ref_config.cfg.replace(ref_config.yolact_base_config)


def test_ssd_augmentation_end_to_end_oracle(ref, ref_aug):
    """The full training pipeline vs the reference under a shared random
    stream: glue, stage order, gating (incl. flip-gates-rot90), padding,
    percent-coord round trips, BackboneTransform."""
    from yolact_tpu.config import get_config
    from yolact_tpu.data import augmentations as ours_aug
    _, ref_config, _, _ = ref
    cfg = get_config('yolact_base').copy(max_size=128,
                                         augment_random_flip=True)
    try:
        ref_config.cfg.replace(ref_config.yolact_base_config.copy(
            {'max_size': 128, 'augment_random_flip': True}))
        for seed in range(6):
            image, masks, boxes, labels = _scene(seed)
            rel = boxes.copy()
            rel[:, [0, 2]] /= image.shape[1]
            rel[:, [1, 3]] /= image.shape[0]
            ref_aug.random = _RandShim(seed)
            ri, rm, rb, rl = ref_aug.SSDAugmentation()(
                image.copy(), masks.copy(), rel.copy(),
                dict(labels, labels=labels['labels'].copy()))
            ours = ours_aug.SSDAugmentation(
                cfg, rng=np.random.RandomState(seed))
            oi, om, ob, ol = ours(image.copy(), masks.copy(), rel.copy(),
                                  dict(labels, labels=labels['labels'].copy()))
            np.testing.assert_allclose(oi, ri, rtol=0, atol=1e-4,
                                       err_msg=f'seed {seed}')
            np.testing.assert_array_equal(om, rm, err_msg=f'seed {seed}')
            np.testing.assert_allclose(ob, rb, rtol=0, atol=1e-6,
                                       err_msg=f'seed {seed}')
            np.testing.assert_array_equal(ol['labels'], rl['labels'])
            assert int(ol['num_crowds']) == int(rl['num_crowds'])
    finally:
        ref_config.cfg.replace(ref_config.yolact_base_config)
