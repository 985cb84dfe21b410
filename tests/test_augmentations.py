import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _tiny import tiny_resnet_config

from yolact_tpu.data import augmentations as A


def scene(rng, h=120, w=160, n=3):
    img = (rng.rand(h, w, 3) * 255).astype(np.float32)
    masks = (rng.rand(n, h, w) > 0.7).astype(np.float32)
    xy1 = rng.rand(n, 2) * 0.5
    wh = rng.rand(n, 2) * 0.4 + 0.1
    boxes = np.concatenate([xy1, np.minimum(xy1 + wh, 1.0)], 1).astype(np.float32)
    labels = {'labels': rng.randint(0, 3, n).astype(np.float64),
              'num_crowds': 0}
    return img, masks, boxes, labels


def test_ssd_augmentation_output_contract(rng):
    cfg = tiny_resnet_config()
    aug = A.SSDAugmentation(cfg, rng=np.random.RandomState(0))
    for seed in range(5):
        img, masks, boxes, labels = scene(np.random.RandomState(seed))
        oi, om, ob, ol = aug(img, masks, boxes, labels)
        S = cfg.max_size
        assert oi.shape == (S, S, 3) and oi.dtype == np.float32
        assert om.shape[1:] == (S, S)
        assert om.shape[0] == ob.shape[0] == len(ol['labels'])
        assert (ob[:, :2] <= ob[:, 2:] + 1e-5).all()
        # boxes are normalized at the end of the pipeline
        assert ob.min() > -1.5 and ob.max() < 2.5


def test_base_transform_deterministic(rng):
    cfg = tiny_resnet_config()
    bt = A.BaseTransform(cfg)
    img = (rng.rand(77, 99, 3) * 255).astype(np.float32)
    o1, *_ = bt(img.copy())
    o2, *_ = bt(img.copy())
    np.testing.assert_array_equal(o1, o2)
    assert o1.shape == (cfg.max_size, cfg.max_size, 3)


@pytest.mark.parametrize('mode', ['normalize', 'subtract_means', 'to_float'])
def test_backbone_transform_math(mode, rng):
    from yolact_tpu.config import MEANS, STD, TransformConfig
    cfg = tiny_resnet_config()
    t = TransformConfig(normalize=(mode == 'normalize'),
                        subtract_means=(mode == 'subtract_means'),
                        to_float=(mode == 'to_float'))
    cfg = cfg.copy(backbone=cfg.backbone.copy(transform=t))
    img = (rng.rand(8, 8, 3) * 255).astype(np.float32)
    out = A.backbone_transform(cfg, img.copy())
    if mode == 'normalize':
        want = (img - np.array(MEANS, np.float32)) / np.array(STD, np.float32)
    elif mode == 'subtract_means':
        want = img - np.array(MEANS, np.float32)
    else:
        want = img / 255.0
    # output is channel-permuted BGR->RGB
    np.testing.assert_allclose(out, want[:, :, ::-1], atol=1e-5)


def test_mirror_flips_boxes():
    cfg = tiny_resnet_config()
    img = np.zeros((10, 10, 3), np.float32)
    masks = np.zeros((1, 10, 10), np.float32)
    masks[0, 2:4, 1:3] = 1
    boxes = np.array([[1., 2., 3., 4.]], np.float32)  # absolute
    rng = np.random.RandomState(1)  # first randint(2) == 1 -> flips
    assert np.random.RandomState(1).randint(2) == 1
    oi, om, ob = A._random_mirror(rng, img, masks, boxes)
    np.testing.assert_allclose(ob[0], [10 - 3, 2, 10 - 1, 4])
    assert om[0, 2, 10 - 2] == 1


def test_expand_keeps_box_mask_alignment(rng):
    img = np.zeros((20, 20, 3), np.float32)
    masks = np.zeros((1, 20, 20), np.float32)
    masks[0, 5:10, 5:10] = 1
    boxes = np.array([[5., 5., 10., 10.]], np.float32)
    r = np.random.RandomState(3)
    oi, om, ob = A._expand(r, img, masks, boxes, mean=(0, 0, 0))
    if oi.shape != img.shape:  # expansion happened
        x1, y1, x2, y2 = ob[0].astype(int)
        assert om[0, y1:y2, x1:x2].sum() == 25


def test_photometric_preserves_shape(rng):
    img = (rng.rand(30, 30, 3) * 255).astype(np.float32)
    out = A._photometric_distort(np.random.RandomState(0), img)
    assert out.shape == img.shape


def test_reference_backbone_transform_parity(rng):
    """Our backbone_transform vs the reference BackboneTransform."""
    import _refutil
    if not _refutil.available():
        pytest.skip('no reference')
    _refutil.import_reference()
    import data.config as ref_config
    from utils.augmentations import BackboneTransform as RefBT
    from yolact_tpu.config import MEANS, STD, get_config

    cfg = get_config('yolact_base')
    img = (rng.rand(16, 16, 3) * 255).astype(np.float32)
    ref = RefBT(ref_config.resnet_transform, MEANS, STD, 'BGR')
    want, *_ = ref(img.copy())
    got = A.backbone_transform(cfg, img.copy())
    np.testing.assert_allclose(got, want, atol=1e-5)
