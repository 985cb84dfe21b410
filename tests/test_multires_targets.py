"""Pre-downsampled gt mask targets (data/coco.py:pad_batch multires).

The reference feeds SOFT (cv2-resized) gt masks into the loss and
binarizes only AFTER the downsample to proto/seg resolution
(multibox_loss.py:515-523, 225-228).  Shipping full-res masks binarized
(required for bit-packing) flips boundary pixels vs that order; the
multires path restores exact parity by computing the downsample+threshold
on the host and shipping the (much smaller) result.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _tiny import tiny_resnet_config


@pytest.fixture
def soft_masks(rng):
    """Binary blobs with soft (fractional) boundaries like cv2 resize."""
    n, S = 3, 128
    m = np.zeros((n, S, S), np.float32)
    for i in range(n):
        x, y = rng.randint(10, 60, 2)
        w, h = rng.randint(20, 50, 2)
        m[i, y:y + h, x:x + w] = 1.0
        # soft boundary ring
        m[i, y - 1, x:x + w] = rng.rand(w) * 0.98 + 0.01
        m[i, y + h, x:x + w] = rng.rand(w) * 0.98 + 0.01
        m[i, y:y + h, x - 1] = rng.rand(h) * 0.98 + 0.01
        m[i, y:y + h, x + w] = rng.rand(h) * 0.98 + 0.01
    return m


def test_pad_batch_multires_matches_torch(soft_masks):
    """Host multires targets == torch F.interpolate(soft) > 0.5, and they
    DIFFER from the binarize-first order on soft boundaries (the bug the
    multires path fixes)."""
    import torch
    import torch.nn.functional as F
    from yolact_tpu.data.coco import pad_batch
    from yolact_tpu.ops.bits import unpack_bits_last

    S = soft_masks.shape[-1]
    Hp, Wp = 32, 32
    Hs, Ws = 16, 16
    imgs = [np.zeros((S, S, 3), np.float32)]
    t = np.array([[0.1, 0.1, 0.5, 0.5, 0],
                  [0.2, 0.2, 0.6, 0.6, 1],
                  [0.3, 0.3, 0.7, 0.7, 2]], np.float32)
    batch = pad_batch(imgs, [t], [soft_masks], [0], max_gt=5,
                      multires={'proto': (Hp, Wp), 'seg': (Hs, Ws)})
    assert 'gt_masks' not in batch
    got_p = np.asarray(unpack_bits_last(batch['gt_masks_proto_packed'],
                                        Wp))[0, :3]
    got_s = np.asarray(unpack_bits_last(batch['gt_masks_seg_packed'],
                                        Ws))[0, :3]

    tm = torch.from_numpy(soft_masks)[None]
    want_p = (F.interpolate(tm, (Hp, Wp), mode='bilinear',
                            align_corners=False)[0] > 0.5).numpy()
    want_s = (F.interpolate(tm, (Hs, Ws), mode='bilinear',
                            align_corners=False)[0] > 0.5).numpy()
    np.testing.assert_array_equal(got_p.astype(bool), want_p)
    np.testing.assert_array_equal(got_s.astype(bool), want_s)

    # binarize-first produces a different (wrong) target on these masks
    hard = (soft_masks > 0.5).astype(np.float32)
    wrong = (F.interpolate(torch.from_numpy(hard)[None], (Hp, Wp),
                           mode='bilinear', align_corners=False)[0]
             > 0.5).numpy()
    assert (want_p != wrong).sum() > 0


def _tiny_batch(rng, cfg, soft=True):
    B, G, S = 2, 4, cfg.max_size
    masks = np.zeros((B, G, S, S), np.float32)
    for b in range(B):
        for g in range(3):
            x, y = rng.randint(5, 70, 2)
            w, h = rng.randint(25, 50, 2)
            masks[b, g, y:y + h, x:x + w] = 1.0
            masks[b, g, y:y + h, x + w] = rng.rand(h)  # soft edge
    if not soft:
        masks = (masks > 0.5).astype(np.float32)
    boxes = np.tile(np.array([[0.1, 0.1, 0.6, 0.6],
                              [0.2, 0.2, 0.7, 0.7],
                              [0.3, 0.3, 0.8, 0.8],
                              [0, 0, 0, 0]], np.float32), (B, 1, 1))
    labels = np.tile(np.array([0, 1, 2, -2], np.int32), (B, 1))
    return dict(image=rng.rand(B, S, S, 3).astype(np.float32),
                gt_boxes=boxes, gt_labels=labels, gt_masks=masks,
                num_gts=np.full(B, 3, np.int32),
                num_crowds=np.zeros(B, np.int32))


def test_train_step_multires_equals_soft_fullres(rng):
    """Losses from packed multires targets == losses from feeding the SOFT
    full-res masks (the reference-exact semantics) directly."""
    import jax
    from yolact_tpu.data.coco import pad_batch
    from yolact_tpu.ops.anchors import proto_size, seg_size
    from yolact_tpu.train.step import create_train_state, train_step

    cfg = tiny_resnet_config()
    batch_soft = _tiny_batch(rng, cfg, soft=True)

    # multires batch built by pad_batch from the same soft masks
    mr = {'proto': proto_size(cfg), 'seg': seg_size(cfg)}
    imgs = list(batch_soft['image'])
    targets = [np.concatenate([batch_soft['gt_boxes'][b, :3],
                               batch_soft['gt_labels'][b, :3, None]], 1)
               for b in range(2)]
    masks = [batch_soft['gt_masks'][b, :3] for b in range(2)]
    batch_mr = pad_batch(imgs, targets, masks, [0, 0], max_gt=4,
                         multires=mr)

    model, state = create_train_state(cfg, seed=0)
    key = jax.random.PRNGKey(7)
    step = jax.jit(lambda s, b: train_step(cfg, model, s, b, key))
    _, losses_soft = step(state, batch_soft)
    _, losses_mr = step(state, batch_mr)
    for k in losses_soft:
        np.testing.assert_allclose(np.asarray(losses_soft[k]),
                                   np.asarray(losses_mr[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)


def test_device_augment_emits_multires(rng):
    """device_augment for lincomb+binarize configs returns downsampled
    targets (soft-warp -> downsample -> threshold) and no full-res masks;
    the train step consumes them end to end."""
    import jax
    from yolact_tpu.data.device_augment import device_augment
    from yolact_tpu.ops.anchors import proto_size, seg_size
    from yolact_tpu.train.step import create_train_state, train_step

    cfg = tiny_resnet_config(use_device_augment=True)
    batch = _tiny_batch(rng, cfg, soft=False)
    batch['image'] = (batch['image'] * 255).astype(np.float32)
    batch['gt_masks'] = batch['gt_masks'].astype(np.uint8)

    out = device_augment(cfg, batch, jax.random.PRNGKey(0))
    assert 'gt_masks' not in out
    Hp, Wp = proto_size(cfg)
    Hs, Ws = seg_size(cfg)
    assert out['gt_masks_proto'].shape[-2:] == (Hp, Wp)
    assert out['gt_masks_seg'].shape[-2:] == (Hs, Ws)

    model, state = create_train_state(cfg, seed=0)
    step = jax.jit(lambda s, b, r: train_step(cfg, model, s, b, r))
    _, losses = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses['total']))
