import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _tiny import tiny_resnet_config

from yolact_tpu.data import device_augment as DA


def make_raw_batch(rng, cfg, B=2, G=6):
    """Raw (un-normalized) padded batch as RawResize+pad_batch would emit."""
    S = cfg.max_size
    boxes = np.zeros((B, G, 4), np.float32)
    labels = np.full((B, G), -2, np.int32)
    masks = np.zeros((B, G, S, S), np.uint8)
    for b in range(B):
        for g in range(3):
            x1, y1 = rng.rand(2) * 0.4 + 0.05
            w, h = rng.rand(2) * 0.3 + 0.15
            x2, y2 = min(x1 + w, 0.98), min(y1 + h, 0.98)
            boxes[b, g] = [x1, y1, x2, y2]
            labels[b, g] = g % (cfg.num_classes - 1)
            masks[b, g, int(y1 * S):int(y2 * S), int(x1 * S):int(x2 * S)] = 1
    return dict(image=(rng.rand(B, S, S, 3) * 255).astype(np.float32),
                gt_boxes=boxes, gt_labels=labels, gt_masks=masks,
                num_gts=np.full(B, 3, np.int32),
                num_crowds=np.zeros(B, np.int32))


def test_hsv_roundtrip(rng):
    img = jnp.asarray(rng.rand(8, 8, 3) * 255, jnp.float32)
    back = DA.hsv_to_bgr(DA.bgr_to_hsv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-2)


def test_identity_when_disabled(rng):
    """With all augmentation flags off the output is just the normalized
    input (the affine map is identity)."""
    # binarize flag off pins the full-res gt_masks output (the multires
    # variant is covered by test_multires_targets.py)
    cfg = tiny_resnet_config(
        augment_photometric_distort=False, augment_expand=False,
        augment_random_sample_crop=False, augment_random_mirror=False,
        mask_proto_binarize_downsampled_gt=False)
    batch = make_raw_batch(rng, cfg)
    out = jax.jit(lambda b, r: DA.device_augment(cfg, b, r))(
        batch, jax.random.PRNGKey(0))

    from yolact_tpu.data.augmentations import backbone_transform
    want = np.stack([backbone_transform(cfg, im) for im in batch['image']])
    np.testing.assert_allclose(np.asarray(out['image']), want, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out['gt_boxes']),
                               batch['gt_boxes'], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out['gt_masks']),
                                  batch['gt_masks'])
    np.testing.assert_array_equal(np.asarray(out['gt_labels']),
                                  batch['gt_labels'])


def test_boxes_and_masks_stay_aligned(rng):
    """For every kept gt, the warped mask's extent must agree with the
    transformed box (IoU of the mask bbox vs gt box > 0.5)."""
    # full-res masks output (the warp itself is what's under test here)
    cfg = tiny_resnet_config(augment_photometric_distort=False,
                             mask_proto_binarize_downsampled_gt=False)
    batch = make_raw_batch(rng, cfg, B=4)
    S = cfg.max_size
    for seed in range(6):
        out = jax.jit(lambda b, r: DA.device_augment(cfg, b, r))(
            batch, jax.random.PRNGKey(seed))
        boxes = np.asarray(out['gt_boxes'])
        labels = np.asarray(out['gt_labels'])
        masks = np.asarray(out['gt_masks'])
        for b in range(boxes.shape[0]):
            for g in range(boxes.shape[1]):
                if labels[b, g] < 0:
                    continue
                m = masks[b, g]
                if m.sum() < 12:
                    continue
                ys, xs = np.where(m)
                mb = np.array([xs.min(), ys.min(), xs.max() + 1,
                               ys.max() + 1]) / S
                gb = boxes[b, g]
                ix = max(0, min(mb[2], gb[2]) - max(mb[0], gb[0]))
                iy = max(0, min(mb[3], gb[3]) - max(mb[1], gb[1]))
                inter = ix * iy
                union = ((mb[2] - mb[0]) * (mb[3] - mb[1]) +
                         (gb[2] - gb[0]) * (gb[3] - gb[1]) - inter)
                assert inter / union > 0.5, (seed, b, g, mb, gb)


def test_train_step_with_device_augment(rng):
    from yolact_tpu.train.step import create_train_state, train_step
    cfg = tiny_resnet_config(use_device_augment=True, freeze_bn=True)
    model, state = create_train_state(cfg, seed=0)
    batch = make_raw_batch(rng, cfg)
    state, losses = jax.jit(lambda s, b, r: train_step(cfg, model, s, b, r))(
        state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses['total'])), losses


def test_flip_and_rot90_alignment(rng):
    """augment_random_flip enables vertical flip + rot90 on device
    (reference flip-gates-rot90 quirk, augmentations.py:454-475,678-679):
    masks and boxes stay aligned through every dihedral transform, and
    the transforms actually fire across seeds."""
    cfg = tiny_resnet_config(augment_photometric_distort=False,
                             augment_expand=False,
                             augment_random_sample_crop=False,
                             augment_random_mirror=False,
                             augment_random_flip=True,
                             mask_proto_binarize_downsampled_gt=False)
    batch = make_raw_batch(rng, cfg, B=2)
    S = cfg.max_size
    base = np.asarray(batch['gt_boxes'])
    changed = 0
    for seed in range(8):
        out = jax.jit(lambda b, r: DA.device_augment(cfg, b, r))(
            batch, jax.random.PRNGKey(seed))
        boxes = np.asarray(out['gt_boxes'])
        labels = np.asarray(out['gt_labels'])
        masks = np.asarray(out['gt_masks'])
        if not np.allclose(boxes, base, atol=1e-5):
            changed += 1
        for b in range(boxes.shape[0]):
            for g in range(boxes.shape[1]):
                if labels[b, g] < 0 or masks[b, g].sum() < 12:
                    continue
                ys, xs = np.where(masks[b, g])
                mb = np.array([xs.min(), ys.min(), xs.max() + 1,
                               ys.max() + 1]) / S
                gb = boxes[b, g]
                ix = max(0, min(mb[2], gb[2]) - max(mb[0], gb[0]))
                iy = max(0, min(mb[3], gb[3]) - max(mb[1], gb[1]))
                inter = ix * iy
                union = ((mb[2] - mb[0]) * (mb[3] - mb[1]) +
                         (gb[2] - gb[0]) * (gb[3] - gb[1]) - inter)
                assert inter / union > 0.5, (seed, b, g, mb, gb)
    assert changed >= 4  # flips/rotations fired on most seeds
