"""Learning-rate schedule and batch-size autoscaling.

Reference semantics:
  * warmup: lr ramps linearly from ``lr_warmup_init`` to ``lr`` over
    ``lr_warmup_until`` iters (``train.py:293-296``);
  * step decay: multiply by ``gamma`` at each entry of ``lr_steps``
    (``train.py:298-301``);
  * batch-size autoscaling: lr and iteration counts scale by
    ``batch_size / 8`` (``train.py:91-98``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from yolact_tpu.config import YolactConfig


def scale_config_for_batch(cfg: YolactConfig, batch_size: int) -> YolactConfig:
    """lr/max_iter/lr_steps autoscaling (train.py:91-98).  No-op at batch 8."""
    factor = batch_size / 8.0
    if factor == 1.0:
        return cfg
    return cfg.copy(
        lr=cfg.lr * factor,
        max_iter=int(cfg.max_iter / factor),
        lr_steps=tuple(int(s / factor) for s in cfg.lr_steps))


def learning_rate(cfg: YolactConfig, step) -> jnp.ndarray:
    """lr at `step` (traceable)."""
    step = jnp.asarray(step, jnp.float32)
    lr = jnp.asarray(cfg.lr, jnp.float32)
    # step decay
    n_decays = sum((step >= s).astype(jnp.int32) for s in cfg.lr_steps) \
        if cfg.lr_steps else 0
    lr = lr * (cfg.gamma ** n_decays)
    # warmup overrides while active
    if cfg.lr_warmup_until > 0:
        warm = (cfg.lr - cfg.lr_warmup_init) * (step / cfg.lr_warmup_until) \
            + cfg.lr_warmup_init
        lr = jnp.where(step < cfg.lr_warmup_until, warm, lr)
    return lr


def apply_delayed_settings(cfg: YolactConfig, iteration: int) -> YolactConfig:
    """Mid-run config mutations (train.py:279-292), applied functionally:
    returns the config with every delayed setting whose iteration has passed
    folded in."""
    changes = {}
    remaining = []
    for it, kv in cfg.delayed_settings:
        if iteration >= it:
            changes.update(dict(kv))
        else:
            remaining.append((it, kv))
    if not changes:
        return cfg
    # consume the applied entries (the reference pops them,
    # train.py:283-285) so subsequent calls return cfg UNCHANGED —
    # callers key "recompile the jitted step" off object identity
    return cfg.copy(delayed_settings=tuple(remaining), **changes)
