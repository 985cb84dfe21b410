"""Model FLOPs + MFU accounting.

Computes per-image forward FLOPs for a named config from XLA's
cost analysis of the lowered (pre-optimisation) HLO — i.e. the
arithmetic the model requires, independent of backend fusion — and
optionally turns a measured fps into MFU against a chip's peak.

Usage:
  python scripts/flops.py [config ...] [--batch 1] [--train]
      [--train-step]       # FULL train step: fwd+bwd+matcher+losses+SGD
      [--fps N]            # derive MFU for a measured rate (img/s, or
                           # steps/s with --train-step)
      [--peak-tflops 197]  # v5e bf16 dense peak (197 TFLOP/s)

Prints one JSON line per config.  The PERF.md headline numbers come from
`--batch 1|8` (inference) and `--batch 8 --train-step --fps <it/s>`.
"""

import argparse
import json
import sys

sys.path.insert(0, '.')


def forward_flops(config_name: str, batch: int = 1,
                  train: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from yolact_tpu.config import get_config
    from yolact_tpu.models.yolact import Yolact

    cfg = get_config(config_name)
    model = Yolact(cfg)
    S = cfg.max_size
    x = jnp.zeros((batch, S, S, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=train))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

    if train:
        fn = jax.jit(lambda v, im: model.apply(v, im, train=True,
                                               mutable=['batch_stats']))
    else:
        fn = jax.jit(lambda v, im: model.apply(v, im, train=False))
    ca = fn.lower(variables, x).cost_analysis() or {}
    flops = float(ca.get('flops', 0.0))
    n_params = sum(p.size for p in jax.tree.leaves(variables['params']))
    return {
        'config': config_name,
        'img_size': S,
        'batch': batch,
        'mode': 'train_fwd' if train else 'inference',
        'params_m': round(n_params / 1e6, 2),
        'flops_per_image_g': round(flops / batch / 1e9, 2),
        'bytes_accessed_gb': round(float(ca.get('bytes accessed', 0.0))
                                   / batch / 1e9, 3),
    }


def train_step_flops(config_name: str, batch: int = 8,
                     max_gt: int = 32) -> dict:
    """Cost-analyse the FULL jitted train step (forward + backward +
    matcher + all losses + SGD update) — the figure the PERF.md train
    MFU row uses.  FLOPs are per optimizer STEP, not per image."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolact_tpu.config import get_config
    from yolact_tpu.train.step import create_train_state, train_step

    cfg = get_config(config_name)
    model, state = create_train_state(cfg, seed=0)
    S, G = cfg.max_size, max_gt
    data = dict(
        image=jnp.zeros((batch, S, S, 3), jnp.float32),
        gt_boxes=jnp.tile(
            jnp.asarray([[0.1, 0.1, 0.6, 0.6]], jnp.float32)[None],
            (batch, G, 1)),
        gt_labels=jnp.ones((batch, G), jnp.int32),
        # full-res masks: the FLOPs superset (the production multires path
        # skips the on-device gt downsample, so its step costs slightly
        # LESS than reported here — conservative for MFU)
        gt_masks=jnp.zeros((batch, G, S, S), jnp.uint8),
        num_gts=jnp.full(batch, G - 1, jnp.int32),
        num_crowds=jnp.ones(batch, jnp.int32))
    fn = jax.jit(lambda s, b, r: train_step(cfg, model, s, b, r))
    ca = fn.lower(state, data, jax.random.PRNGKey(0)).cost_analysis() or {}
    flops = float(ca.get('flops', 0.0))
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    return {
        'config': config_name,
        'img_size': S,
        'batch': batch,
        'mode': 'train_step',
        'params_m': round(n_params / 1e6, 2),
        'flops_per_step_g': round(flops / 1e9, 2),
        'flops_per_image_g': round(flops / batch / 1e9, 2),
        'bytes_accessed_gb': round(float(ca.get('bytes accessed', 0.0))
                                   / 1e9, 3),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('configs', nargs='*', default=['yolact_base'])
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--train', action='store_true',
                    help='forward pass in train mode (BN stats); use '
                         '--train-step for the full optimizer step')
    ap.add_argument('--train-step', action='store_true',
                    help='full train step: fwd+bwd+matcher+losses+SGD')
    ap.add_argument('--fps', type=float, default=None,
                    help='measured img/s (steps/s with --train-step) -> MFU')
    ap.add_argument('--peak-tflops', type=float, default=197.0,
                    help='chip peak (v5e bf16 dense = 197)')
    args = ap.parse_args(argv)

    for name in (args.configs or ['yolact_base']):
        if args.train_step:
            row = train_step_flops(name, args.batch)
            rate_key = 'flops_per_step_g'
        else:
            row = forward_flops(name, args.batch, args.train)
            rate_key = 'flops_per_image_g'
        if args.fps:
            sustained = row[rate_key] * 1e9 * args.fps
            row['fps'] = args.fps
            row['mfu_pct'] = round(
                sustained / (args.peak_tflops * 1e12) * 100, 2)
        print(json.dumps(row))


if __name__ == '__main__':
    main()
