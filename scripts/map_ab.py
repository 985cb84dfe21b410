"""One-command mAP-risk A/B on real hardware.

Runs the full dataset eval on a synthetic COCO set with overfit weights
and prints a table A/B-ing every behavior-deviating knob:

- nms_candidates: 0 (exact) vs 1024 (fast path) vs 8 (forces the runtime
  crowded-batch fallback)
- compute dtype: float32 vs bfloat16 trunk
- mask assembly: Pallas kernel vs XLA fusion (TPU only; on CPU both rows
  take the XLA path and are expected identical)

Usage: python scripts/map_ab.py [--steps 200]

This is the offline half of the published-weights parity plan (NOTES.md):
when real COCO + .pth weights are available, re-run the same axes via
cli.eval on the real set.  tests/test_map_ab.py asserts the CPU-runnable
axes in CI.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=200)
    args = ap.parse_args()

    from pathlib import Path

    import jax.extend.backend

    from _tiny import tiny_resnet_config
    from test_eval import _write_tiny_coco
    from test_map_ab import overfit_variables
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset

    tmp = Path(tempfile.mkdtemp(prefix='map_ab_'))
    img_dir, json_path = _write_tiny_coco(tmp)
    cfg = tiny_resnet_config()
    cfg = cfg.copy(dataset=cfg.dataset.copy(
        valid_images=img_dir, valid_info=json_path,
        class_names=('thing', 'b', 'c', 'd'), label_map=None))
    dataset = make_eval_dataset(cfg)
    print(f'overfitting {args.steps} steps on '
          f'{jax.extend.backend.get_backend().platform} ...')
    variables = overfit_variables(cfg, dataset, steps=args.steps)

    def run(c, **kw):
        m = evaluate_dataset(c, variables, dataset, quiet=True,
                             device_mask_iou=False, **kw)
        return m['box']['all'], m['mask']['all']

    rows = []
    rows.append(('nms_candidates=0 (exact)', run(cfg.copy(nms_candidates=0))))
    rows.append(('nms_candidates=1024', run(cfg.copy(nms_candidates=1024))))
    rows.append(('nms_candidates=8 (fallback)', run(cfg.copy(nms_candidates=8))))
    rows.append(('trunk float32', run(cfg.copy(compute_dtype='float32'))))
    rows.append(('trunk bfloat16', run(cfg.copy(compute_dtype='bfloat16'))))
    os.environ.pop('YOLACT_TPU_NO_PALLAS_MASKS', None)
    rows.append(('mask assembly pallas/default', run(cfg)))
    os.environ['YOLACT_TPU_NO_PALLAS_MASKS'] = '1'
    rows.append(('mask assembly XLA', run(cfg)))
    os.environ.pop('YOLACT_TPU_NO_PALLAS_MASKS', None)

    print(f'\n{"knob":32s} {"box mAP":>8s} {"mask mAP":>9s}')
    for name, (b, m) in rows:
        print(f'{name:32s} {b:8.2f} {m:9.2f}')

    ok = True
    base = rows[0][1]
    for name, vals in rows[1:3]:
        if vals != base:
            ok = False
            print(f'MISMATCH: {name} != exact')
    if rows[5][1] != rows[6][1]:
        ok = False
        print('MISMATCH: pallas vs XLA mask assembly')
    print('A/B', 'CLEAN' if ok else 'DIRTY')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
