"""Model FLOPs + MFU accounting.

Computes per-image forward FLOPs for a named config from XLA's
cost analysis of the lowered (pre-optimisation) HLO — i.e. the
arithmetic the model requires, independent of backend fusion — and
optionally turns a measured fps into MFU against a chip's peak.

Usage:
  python scripts/flops.py [config ...] [--batch 1] [--train]
      [--fps N]            # derive MFU for a measured rate
      [--peak-tflops 197]  # v5e bf16 dense peak (197 TFLOP/s)

Prints one JSON line per config.
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('configs', nargs='*', default=['yolact_base'])
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--train', action='store_true')
    ap.add_argument('--fps', type=float, default=None,
                    help='measured end-to-end frames/sec -> MFU')
    ap.add_argument('--peak-tflops', type=float, default=197.0,
                    help='chip peak (v5e bf16 dense = 197)')
    args = ap.parse_args(argv)

    for name in (args.configs or ['yolact_base']):
        row = forward_flops(name, args.batch, args.train)
        if args.fps:
            sustained = row['flops_per_image_g'] * 1e9 * args.fps
            row['fps'] = args.fps
            row['mfu_pct'] = round(
                sustained / (args.peak_tflops * 1e12) * 100, 2)
        print(json.dumps(row))


if __name__ == '__main__':
    main()
