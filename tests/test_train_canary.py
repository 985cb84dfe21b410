"""Long-horizon training canary (VERDICT round-1 item 9).

A few hundred optimizer steps on a tiny maskiou-enabled config, cycling
several distinct synthetic batches (not single-batch overfitting).  Guards
the two failure modes observed in round 1:

  * the 'I' (maskiou) loss diverging on pathological data — the reference
    trains it with the same recipe (reference layers/modules/multibox_loss.py:684-694,
    yolact.py:363-375), so a blow-up here is a regression in our branch;
  * silent training stalls where the non-finite-grad guard eats every step.

The full-scale counterpart is ``scripts/train_horizon.py`` whose 1k-iter
550^2 b8 JSONL log + loss plot is committed under ``results/``.
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from _tiny import tiny_resnet_config
from test_train import make_batch

CANARY_STEPS = int(os.environ.get('YOLACT_TPU_CANARY_STEPS', '200'))


def test_canary_maskiou_converges():
    from yolact_tpu.train.step import create_train_state, train_step
    base = tiny_resnet_config(
        use_maskiou=True,
        maskiou_net=((8, 3, (('stride', 2),)), (16, 3, (('stride', 2),))),
        maskiou_alpha=25)
    cfg = base.copy(
        max_size=64,
        backbone=base.backbone.copy(
            pred_scales=((3,), (6,), (12,), (24,), (48,))))
    model, state = create_train_state(cfg, seed=0)
    step = jax.jit(lambda s, b, r: train_step(cfg, model, s, b, r))

    rng = np.random.RandomState(42)
    batches = [make_batch(rng, cfg, B=1, G=6) for _ in range(4)]

    key = jax.random.PRNGKey(0)
    totals, i_losses = [], []
    for i in range(CANARY_STEPS):
        key, sk = jax.random.split(key)
        state, losses = step(state, batches[i % len(batches)], sk)
        host = {k: float(v) for k, v in losses.items()}
        for k, v in host.items():
            assert np.isfinite(v), (i, k, host)
        totals.append(host['total'])
        i_losses.append(host['I'])

    # every step applied (no silent non-finite-grad skips)
    assert int(state.step) == CANARY_STEPS

    head = float(np.mean(totals[:20]))
    tail = float(np.mean(totals[-20:]))
    assert tail < 0.7 * head, (head, tail)

    # maskiou loss must not blow up relative to its starting plateau
    assert float(np.mean(i_losses[-20:])) < \
        2.0 * float(np.mean(i_losses[:20])), \
        (np.mean(i_losses[:20]), np.mean(i_losses[-20:]))
