"""jit/pjit training step.

Replaces the reference's iteration core (``train.py:265-366``): SGD with
momentum + weight decay (identical update rule to ``optim.SGD``), the
warmup/step-decay schedule, the non-finite-loss guard (``train.py:312-318``
skips the optimizer step but the JAX version needs no explicit backward to
free memory), and DataParallel loss averaging — here the batch dim is sharded
over a 1-D mesh and XLA's SPMD partitioner inserts the gradient all-reduce
over ICI.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from yolact_tpu.config import YolactConfig
from yolact_tpu.models.yolact import MaskIoUHead, Yolact
from yolact_tpu.train.loss import multibox_loss
from yolact_tpu.train.schedule import learning_rate


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # running selected-example class counts for use_class_balanced_conf
    # (reference keeps these as MultiBoxLoss module state)
    conf_state: Any = None


def make_optimizer(cfg: YolactConfig) -> optax.GradientTransformation:
    """torch-SGD-equivalent: buf = m*buf + (g + wd*w); p -= lr*buf
    (train.py:216-217).

    The returned transformation is LR-FREE (scale(-1) only): train_step
    multiplies updates by ``learning_rate(cfg, state.step)``.  Driving
    the schedule from state.step instead of optax's internal update
    counter keeps resumed / --start_iter runs on the right lr (the
    internal counter restarts at 0 and would re-run warmup)."""
    return optax.chain(
        optax.add_decayed_weights(cfg.decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale(-1.0),
    )


def _freeze_bn_grads(grads):
    """Zero gradients of BatchNorm scale/bias (freeze_bn, yolact.py:555-562)."""
    def zero_bn(path, g):
        keys = [getattr(p, 'key', '') for p in path]
        return jnp.zeros_like(g) if 'bn' in keys else g
    return jax.tree_util.tree_map_with_path(zero_bn, grads)


def create_train_state(cfg: YolactConfig, seed: int = 0,
                       img_size: Optional[int] = None) -> Tuple[Any, TrainState]:
    model = Yolact(cfg)
    size = img_size or cfg.max_size
    dummy = jnp.zeros((1, size // 2, size // 2, 12) if cfg.stem_s2d
                      else (1, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy, train=True)
    params = {'model': variables['params']}
    if cfg.use_maskiou:
        miou = MaskIoUHead(cfg)
        Hp = 2 * (size // 4)  # proto resolution for standard configs
        mv = miou.init(jax.random.PRNGKey(seed + 1),
                       jnp.zeros((1, Hp, Hp, 1), jnp.float32))
        params['maskiou'] = mv['params']
    tx = make_optimizer(cfg)
    conf_state = None
    if cfg.use_class_balanced_conf:
        conf_state = {'class_counts': jnp.zeros(cfg.num_classes, jnp.float32),
                      'total': jnp.zeros((), jnp.float32)}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables.get('batch_stats', {}),
                       opt_state=tx.init(params), tx=tx,
                       conf_state=conf_state)
    return model, state


def train_step(cfg: YolactConfig, model: Yolact, state: TrainState,
               batch: Dict, rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SGD step.  Pure function of (state, batch, rng); jit/pjit-ready."""
    maskiou_model = MaskIoUHead(cfg) if cfg.use_maskiou else None
    bn_train = not cfg.freeze_bn  # frozen BN never touches batch_stats

    if 'gt_masks_packed' in batch:
        # gt masks arrive bit-packed (8 pixels/byte) to cut host->device
        # transfer 8x (data/coco.py:pack_batch_masks); unpack on device
        from yolact_tpu.ops.bits import packed_width, unpack_bits_last
        batch = dict(batch)
        packed = batch.pop('gt_masks_packed')
        # masks are packed along their width — image dim 2 (NHWC); the
        # unpack target width comes from the image, so catch any future
        # mask-canvas/image-width divergence loudly instead of silently
        # truncating or zero-extending
        W = batch['image'].shape[2]
        assert packed.shape[-1] == packed_width(W), (
            f'packed gt-mask width {packed.shape[-1]} != packed_width({W})'
            f'={packed_width(W)}; mask canvas no longer equals image width')
        batch['gt_masks'] = unpack_bits_last(packed, W)

    if cfg.use_device_augment:
        from yolact_tpu.data.device_augment import device_augment
        rng, aug_rng = jax.random.split(rng)
        batch = device_augment(cfg, batch, aug_rng)

    image = batch['image']
    if image.dtype != jnp.float32:   # uint8 raw transport (loader
        image = image.astype(jnp.float32)  # pack_images) casts on chip
    if cfg.stem_s2d:
        # the loader/augment pipeline emits normalized RGB images; the
        # s2d stem consumes raw-order space-to-depth (models/layers.py)
        from yolact_tpu.models.layers import s2d_input
        image = s2d_input(image, from_rgb=True)

    def loss_fn(params):
        out = model.apply(
            {'params': params['model'], 'batch_stats': state.batch_stats},
            image, train=True,
            mutable=['batch_stats'] if bn_train else False)
        if bn_train:
            preds, new_model_state = out
            new_stats = new_model_state['batch_stats']
        else:
            preds, new_stats = out, state.batch_stats

        maskiou_apply = None
        if maskiou_model is not None:
            maskiou_apply = lambda m: maskiou_model.apply(
                {'params': params['maskiou']}, m)
        losses, _ = multibox_loss(cfg, rng, preds, batch,
                                  maskiou_apply=maskiou_apply,
                                  conf_state=state.conf_state)
        new_conf_state = losses.pop('_conf_state', state.conf_state)
        total = sum(losses.values())
        return total, (losses, new_stats, new_conf_state)

    (total, (losses, new_stats, new_conf_state)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)

    # non-finite guard (train.py:312-318) — extended to the gradients: the
    # loss can still be finite on the step where the backward pass
    # overflows, and a loss-only check (the reference's) lets NaN into the
    # params permanently.
    grads_finite = jnp.array(True)
    for g in jax.tree_util.tree_leaves(grads):
        grads_finite &= jnp.all(jnp.isfinite(g))
    finite = jnp.isfinite(total) & grads_finite
    grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)),
                         grads)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    lr = learning_rate(cfg, state.step)  # resume-safe: from state.step
    updates = jax.tree.map(lambda u: lr * u, updates)
    if cfg.freeze_bn:
        # frozen params get NO update at all — torch skips params whose
        # .grad is None, so weight decay doesn't touch them either
        updates = _freeze_bn_grads(updates)
    new_state = state.replace(step=state.step + 1,
                              params=optax.apply_updates(state.params, updates),
                              opt_state=new_opt)
    new_state = new_state.replace(conf_state=new_conf_state)
    # iteration still advances on a skipped step, like the reference loop.
    # batch_stats roll back too on a non-finite step — the reference's BN
    # running stats are poisoned forever by one NaN forward (torch updates
    # them during forward regardless); no reason to preserve that failure
    new_state = jax.tree.map(lambda new, old: jnp.where(finite, new, old),
                             new_state.replace(batch_stats=new_stats),
                             state.replace(step=new_state.step,
                                           conf_state=new_conf_state))
    losses = dict(losses, total=total, lr=lr)
    return new_state, losses
