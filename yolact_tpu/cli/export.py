"""Export the full inference pipeline as a self-contained StableHLO
artifact (weights baked in) — the deployment story the reference
approximates with TorchScript (``yolact.py:25-30``), but covering the
whole pipeline (preprocess..NMS..mask assembly) in one program.

python -m yolact_tpu.cli.export --trained_model=weights/yolact_base_54_800000.pth \\
    --out=yolact_base.ystablehlo --batch_size=1 [--platforms=tpu,cpu]
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='YOLACT-TPU AOT export')
    p.add_argument('--trained_model', required=True, type=str)
    p.add_argument('--config', default=None, type=str)
    p.add_argument('--out', required=True, type=str)
    p.add_argument('--batch_size', default=1, type=int)
    p.add_argument('--height', default=None, type=int)
    p.add_argument('--width', default=None, type=int)
    p.add_argument('--platforms', default=None, type=str,
                   help='comma-separated (e.g. "tpu,cpu"); default: '
                        'current backend')
    p.add_argument('--score_threshold', default=0.0, type=float)
    p.add_argument('--selftest', action='store_true',
                   help='reload the artifact and run a zero batch')
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from yolact_tpu.config import config_from_model_path, get_config
    from yolact_tpu.convert.export import export_inference, load_exported
    from yolact_tpu.train.checkpoint import load_weights

    if args.config is None:
        cfg = config_from_model_path(args.trained_model)
        print(f'Config not specified. Parsed {cfg.name}_config from the '
              f'file name.\n')
    else:
        cfg = get_config(args.config)

    variables = load_weights(cfg, args.trained_model)
    maskiou_vars = variables.pop('maskiou', None) if isinstance(
        variables, dict) else None

    platforms = [p.strip() for p in args.platforms.split(',')
                 if p.strip()] if args.platforms else None
    export_inference(cfg, variables, args.out,
                     batch_size=args.batch_size,
                     height=args.height, width=args.width,
                     maskiou_variables=maskiou_vars,
                     platforms=platforms,
                     score_threshold=args.score_threshold)
    import os
    print(f'Exported {args.out} '
          f'({os.path.getsize(args.out) / 1e6:.1f} MB)')

    if args.selftest:
        import numpy as np
        runner = load_exported(args.out)
        m = runner.meta
        out = runner(np.zeros((m['batch'], m['height'], m['width'], 3),
                              np.float32))
        print('selftest ok:', [tuple(np.asarray(o).shape) for o in out])


if __name__ == '__main__':
    main()
