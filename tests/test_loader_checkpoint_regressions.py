"""Regression tests for loader/checkpoint review findings (round 2)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _tiny import tiny_resnet_config


class _FakeDataset:
    """Minimal pull_item-compatible dataset of n tiny images."""

    def __init__(self, n=8, size=32, fail_at=None):
        self.n = n
        self.size = size
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def pull_item(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise RuntimeError('corrupt image (synthetic)')
        S = self.size
        img = np.zeros((S, S, 3), np.float32)
        target = np.array([[0.1, 0.1, 0.5, 0.5, 0]], np.float32)
        masks = np.ones((1, S, S), np.float32)
        return img, target, masks, S, S, 0


def test_loader_worker_error_propagates():
    """A failing pull_item must surface in next_batch, not hang the
    consumer behind a silently dead worker thread."""
    from yolact_tpu.data.loader import BatchLoader
    loader = BatchLoader(_FakeDataset(n=8, fail_at=3), batch_size=4,
                         num_workers=1, shuffle=False)
    with pytest.raises(RuntimeError, match='corrupt image'):
        for _ in range(10):
            loader.next_batch()
    loader.stop()


def test_loader_tiny_dataset_guard():
    from yolact_tpu.data.loader import BatchLoader
    with pytest.raises(ValueError, match='drop_last'):
        BatchLoader(_FakeDataset(n=3), batch_size=8)
    # drop_last=False wraps/tiles to a full static batch
    loader = BatchLoader(_FakeDataset(n=3), batch_size=8, drop_last=False,
                         num_workers=1)
    batch = loader.next_batch()
    assert batch['image'].shape[0] == 8
    loader.stop()


def test_load_weights_accepts_train_state_ckpt(tmp_path):
    """eval --trained_model=<cli-train checkpoint>.ckpt must work: the
    train-state blob is unwrapped to inference variables, maskiou head
    included (regression: the raw state dict crashed Pipeline)."""
    import jax
    from yolact_tpu.train import checkpoint as ckpt
    from yolact_tpu.train.step import create_train_state

    cfg = tiny_resnet_config(
        use_maskiou=True,
        maskiou_net=((8, 3, (('stride', 2),)),))
    model, state = create_train_state(cfg, seed=0)
    path = str(tmp_path / 'tiny_1_100.ckpt')
    ckpt.save_checkpoint(state, path)

    variables = ckpt.load_weights(cfg, path)
    assert 'params' in variables and 'batch_stats' in variables
    # params are the MODEL subtree, not the train-state nesting
    assert 'backbone' in variables['params']
    maskiou = variables.pop('maskiou')
    assert 'params' in maskiou

    # and they drive a real forward pass
    from yolact_tpu.infer import Pipeline
    pipe = Pipeline(cfg, variables, maskiou_variables=maskiou,
                    preprocess=False)
    out = pipe(np.zeros((1, cfg.max_size, cfg.max_size, 3), np.float32))
    assert out.boxes.shape[0] == 1


def test_load_checkpoint_without_conf_state(tmp_path):
    """Resuming a pre-class-balanced checkpoint into a template WITH
    conf_state keeps the fresh counts instead of crashing."""
    import jax
    from yolact_tpu.train import checkpoint as ckpt
    from yolact_tpu.train.step import create_train_state

    cfg = tiny_resnet_config()
    _, state_plain = create_train_state(cfg, seed=0)
    path = str(tmp_path / 'tiny_1_50.ckpt')
    ckpt.save_checkpoint(state_plain, path)

    cfg2 = tiny_resnet_config(use_class_balanced_conf=True)
    _, template = create_train_state(cfg2, seed=1)
    restored = ckpt.load_checkpoint(path, template)
    assert restored.conf_state is not None
    assert float(np.asarray(restored.conf_state['total'])) == 0.0


def test_prune_deletes_only_previous_latest(tmp_path):
    """--keep_latest deletes exactly the one checkpoint the current run
    just superseded (train.py:356-366) — never pre-existing files from
    other runs, never interrupt states."""
    from yolact_tpu.train.checkpoint import prune_previous_checkpoint
    names = ['tiny_1_100.ckpt', 'tiny_2_200.ckpt', 'tiny_3_300.ckpt',
             'tiny_2_150_interrupt.ckpt']
    for n in names:
        (tmp_path / n).write_bytes(b'x')
    # simulating: latest before the new save was tiny_3_300; new save at 400
    prune_previous_checkpoint(str(tmp_path / 'tiny_3_300.ckpt'),
                              iteration=400, save_interval=100,
                              keep_latest_interval=0)
    left = sorted(os.listdir(tmp_path))
    assert 'tiny_3_300.ckpt' not in left         # previous latest pruned
    assert 'tiny_1_100.ckpt' in left             # other runs untouched
    assert 'tiny_2_200.ckpt' in left
    assert 'tiny_2_150_interrupt.ckpt' in left   # never auto-pruned

    # keep interval: previous save sat on a multiple of the interval
    # (reference condition iteration % interval == save_interval)
    prune_previous_checkpoint(str(tmp_path / 'tiny_2_200.ckpt'),
                              iteration=300, save_interval=100,
                              keep_latest_interval=200)
    assert 'tiny_2_200.ckpt' in os.listdir(tmp_path)   # kept (200 % 200 == 0)
    prune_previous_checkpoint(str(tmp_path / 'tiny_1_100.ckpt'),
                              iteration=200, save_interval=100,
                              keep_latest_interval=200)
    assert 'tiny_1_100.ckpt' not in os.listdir(tmp_path)  # not on interval


def test_loader_pack_images_uint8():
    """pack_images ships raw-pixel batches as uint8 (4x less host->device
    transfer on the device-augment path)."""
    from yolact_tpu.data.loader import BatchLoader
    loader = BatchLoader(_FakeDataset(n=8), batch_size=4, num_workers=1,
                         pack_images=True)
    batch = loader.next_batch()
    assert batch['image'].dtype == np.uint8
    loader.stop()


def test_load_checkpoint_migrates_old_optimizer_chain(tmp_path):
    """A checkpoint saved with the pre-round-2 optimizer chain (lr
    schedule INSIDE optax -> ScaleByScheduleState(count)) must load into
    the new chain (lr applied in train_step), keeping the momentum
    trace and dropping the stale schedule count."""
    import jax
    import optax
    from flax import serialization
    from yolact_tpu.train import checkpoint as ckpt
    from yolact_tpu.train.step import create_train_state

    cfg = tiny_resnet_config()
    _, state = create_train_state(cfg, seed=0)

    # simulate the OLD chain's opt_state blob
    old_tx = optax.chain(
        optax.add_decayed_weights(cfg.decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale_by_learning_rate(lambda s: 1e-3))
    old_opt = old_tx.init(state.params)
    # give the trace recognizable values
    old_opt = jax.tree.map(lambda x: x + 1.0 if x.dtype == np.float32 else x,
                           old_opt)
    blob = {
        'step': np.asarray(7),
        'params': jax.tree.map(np.asarray, state.params),
        'batch_stats': jax.tree.map(np.asarray, state.batch_stats),
        'opt_state': serialization.to_state_dict(
            jax.tree.map(np.asarray, old_opt)),
    }
    path = str(tmp_path / 'tiny_1_7.ckpt')
    with open(path, 'wb') as f:
        f.write(serialization.msgpack_serialize(blob))

    restored = ckpt.load_checkpoint(path, state)
    assert int(restored.step) == 7
    # momentum trace survived the migration
    tr = restored.opt_state[1].trace['model']['backbone']['conv1']['conv'][
        'kernel']
    assert float(np.asarray(tr).min()) == pytest.approx(1.0)


def test_loader_deterministic_order_across_workers():
    """Batch delivery is in epoch order regardless of worker count
    (torch DataLoader reorders by index the same way), so a fixed seed
    reproduces the exact batch sequence."""
    from yolact_tpu.data.loader import BatchLoader

    class _IdDataset(_FakeDataset):
        def pull_item(self, i):
            img, target, masks, h, w, nc = super().pull_item(i)
            img = img + float(i)  # encode the dataset index
            return img, target, masks, h, w, nc

    def first_ids(workers):
        loader = BatchLoader(_IdDataset(n=16), batch_size=4,
                             num_workers=workers, seed=7)
        try:
            return [np.asarray(loader.next_batch()['image'])[:, 0, 0, 0]
                    .round().tolist() for _ in range(8)]
        finally:
            loader.stop()

    assert first_ids(1) == first_ids(4)


def test_loader_next_batch_raises_after_stop():
    from yolact_tpu.data.loader import BatchLoader
    loader = BatchLoader(_FakeDataset(n=8), batch_size=4, num_workers=1)
    loader.next_batch()
    loader.stop()
    import pytest
    with pytest.raises(RuntimeError, match='stopped'):
        # drain whatever was already queued, then it must raise (never
        # block forever)
        for _ in range(16):
            loader.next_batch()


def test_loader_short_batch_marks_num_valid():
    from yolact_tpu.data.loader import BatchLoader
    loader = BatchLoader(_FakeDataset(n=6), batch_size=4, num_workers=1,
                         drop_last=False, shuffle=False)
    try:
        b1 = loader.next_batch()
        b2 = loader.next_batch()
    finally:
        loader.stop()
    assert 'num_valid' not in b1
    assert b2['num_valid'] == 2  # 6 = 4 + 2: the tail batch wrapped around
