"""Long-horizon real-scale training artifact.

Synthesizes a *learnable* COCO-format dataset (colored shapes on textured
backgrounds, 8 categories keyed by shape x color), registers a
``<config>_horizon`` variant pointing at it, runs >=1k iterations of the
production CLI trainer (``yolact_tpu/cli/train.py``) at full 550^2 /
batch-8 scale on the attached chip, and renders LogVisualizer plots of
the per-letter loss curves from the JSONL log.

Mirrors the reference's convergence conventions (train.py:265-366 in the
reference): default schedule (lr 1e-3, 500-iter warmup from 1e-4), SGD +
momentum + weight decay, bf16 compute / f32 params.

    python scripts/train_horizon.py yolact_base --iters 1000
    python scripts/train_horizon.py yolact_plus_resnet50 --iters 1000

Outputs (committed as the artifact):
    results/horizon_logs/<config>_horizon.log   JSONL training log
    results/horizon_<config>.png                loss-letter curves
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import yolact_tpu.utils.jax_setup  # noqa: E402,F401  persistent compile cache

# shape x color -> category id 1..8 (all valid COCO ids, so the stock
# coco2017 label_map and 81-class head are exercised unchanged)
SHAPES = ('rect', 'circle', 'triangle', 'ellipse')
COLORS = ((235, 80, 60), (70, 140, 235))  # warm / cool


def _draw_object(img, rng, shape, color):
    """Draw one filled shape; return (poly_xy list, bbox xywh)."""
    import cv2
    h, w = img.shape[:2]
    cx = int(rng.randint(60, w - 60))
    cy = int(rng.randint(60, h - 60))
    sx = int(rng.randint(25, 90))
    sy = int(rng.randint(25, 90))
    if shape == 'rect':
        pts = np.array([[cx - sx, cy - sy], [cx + sx, cy - sy],
                        [cx + sx, cy + sy], [cx - sx, cy + sy]])
    elif shape == 'triangle':
        pts = np.array([[cx, cy - sy], [cx + sx, cy + sy], [cx - sx, cy + sy]])
    else:  # circle / ellipse as a 24-gon
        t = np.linspace(0, 2 * np.pi, 24, endpoint=False)
        rx, ry = (sx, sx) if shape == 'circle' else (sx, sy)
        pts = np.stack([cx + rx * np.cos(t), cy + ry * np.sin(t)], -1)
    pts = np.clip(np.round(pts), [0, 0], [w - 1, h - 1]).astype(np.int32)
    cv2.fillPoly(img, [pts], color)
    x0, y0 = pts.min(0)
    x1, y1 = pts.max(0)
    poly = [float(v) for xy in pts for v in xy]
    return poly, [float(x0), float(y0), float(x1 - x0), float(y1 - y0)]


def make_dataset(out_dir, n_images=64, width=640, height=480, seed=0):
    """Write a synthetic COCO dataset: images/ + instances.json."""
    import cv2
    img_dir = os.path.join(out_dir, 'images')
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img_id = 1000 + i
        # textured background: smooth 2-D gradient + mild noise
        gx = np.linspace(0, 1, width)[None, :]
        gy = np.linspace(0, 1, height)[:, None]
        base = (60 + 100 * (gx * rng.rand() + gy * rng.rand()))
        img = np.stack([base + rng.randn(height, width) * 8
                        for _ in range(3)], -1)
        img = np.clip(img, 0, 255).astype(np.uint8)
        for _ in range(int(rng.randint(3, 8))):
            si = int(rng.randint(len(SHAPES)))
            ci = int(rng.randint(len(COLORS)))
            poly, bbox = _draw_object(img, rng, SHAPES[si], COLORS[ci])
            if bbox[2] < 8 or bbox[3] < 8:
                continue
            annotations.append({
                'id': ann_id, 'image_id': img_id,
                'category_id': si * len(COLORS) + ci + 1,
                'bbox': bbox, 'area': bbox[2] * bbox[3], 'iscrowd': 0,
                'segmentation': [poly]})
            ann_id += 1
        name = f'{img_id:012d}.jpg'
        cv2.imwrite(os.path.join(img_dir, name), img[:, :, ::-1])
        images.append({'id': img_id, 'file_name': name,
                       'width': width, 'height': height})
    cats = [{'id': si * len(COLORS) + ci + 1,
             'name': f'{SHAPES[si]}_{"warm" if ci == 0 else "cool"}'}
            for si in range(len(SHAPES)) for ci in range(len(COLORS))]
    info = {'images': images, 'annotations': annotations, 'categories': cats}
    json_path = os.path.join(out_dir, 'instances.json')
    with open(json_path, 'w') as f:
        json.dump(info, f)
    return img_dir, json_path


def plot_log(log_path, out_png):
    """Loss-letter curves + lr from the JSONL log via LogVisualizer."""
    from yolact_tpu.utils.logger import LogVisualizer
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    vis = LogVisualizer()
    vis.load(log_path)
    iters = vis.query('data.iter', 'train')
    if not iters:
        raise SystemExit(f'no train entries in {log_path} — did the run '
                         'reach the first log interval?')
    letters = sorted(vis.query('data.loss', 'train')[0].keys())
    fig, (ax, ax2) = plt.subplots(
        2, 1, figsize=(9, 7), sharex=True,
        gridspec_kw={'height_ratios': [3, 1]})
    # x/y paired per entry (query_joined): entries missing a value skip,
    # instead of shifting the curve onto the earliest iterations
    for letter in letters:
        pairs = vis.query_joined(('data.iter', f'data.loss.{letter}'),
                                 'train')
        if pairs:
            xs, ys = zip(*pairs)
            ax.plot(xs, ys, label=letter, linewidth=1.0)
    totals = vis.query_joined(
        ('data.iter', lambda e: sum(e['data']['loss'].values())), 'train')
    if totals:
        xs, ys = zip(*totals)
        ax.plot(xs, ys, label='total', color='k', linewidth=1.8)
    ax.set_yscale('log')
    ax.set_ylabel('loss')
    ax.legend(ncol=4, fontsize=8)
    ax.set_title(os.path.basename(log_path))
    lr_pairs = vis.query_joined(('data.iter', 'data.lr'), 'train')
    if lr_pairs:
        xs, lrs = zip(*lr_pairs)
        ax2.plot(xs, lrs, color='tab:gray')
    ax2.set_ylabel('lr')
    ax2.set_xlabel('iteration')
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    print(f'wrote {out_png}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config', nargs='?', default='yolact_base')
    ap.add_argument('--iters', type=int, default=1000)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--images', type=int, default=64)
    ap.add_argument('--lr', type=float, default=None,
                    help='override lr (default: config schedule)')
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--data_dir', default='results/horizon_data')
    ap.add_argument('--out_dir', default='results')
    ap.add_argument('--plot_only', action='store_true')
    ap.add_argument('--eval', metavar='CKPT', default=None,
                    help='skip training; evaluate this horizon checkpoint '
                         'on the synthetic val set (full eval->mAP loop)')
    ap.add_argument('--resume', default=None,
                    help="passed through to the trainer ('latest' resumes "
                         'the newest horizon checkpoint)')
    args = ap.parse_args()

    from yolact_tpu.config import get_config, register_config
    from yolact_tpu.cli.train import train

    name = f'{args.config}_horizon'
    log_path = os.path.join(args.out_dir, 'horizon_logs', name + '.log')
    png_path = os.path.join(args.out_dir, f'horizon_{args.config}.png')
    if args.plot_only:
        plot_log(log_path, png_path)
        return

    img_dir = os.path.join(args.data_dir, 'images')
    json_path = os.path.join(args.data_dir, 'instances.json')
    if not os.path.exists(json_path):
        print(f'Synthesizing {args.images}-image shape dataset...')
        img_dir, json_path = make_dataset(args.data_dir, args.images)

    base = get_config(args.config)
    cfg = base.copy(
        name=name, max_iter=args.iters,
        dataset=base.dataset.copy(
            train_images=img_dir, train_info=json_path,
            valid_images=img_dir, valid_info=json_path))
    register_config(cfg)

    if args.eval:
        # Close the loop: trained checkpoint -> full dataset eval -> mAP
        # (forward -> detect -> postprocess -> greedy AP match -> calc_map),
        # proving the train->eval chain end-to-end on the real chip.
        from yolact_tpu.eval.evaluate import evaluate_dataset, \
            make_eval_dataset
        from yolact_tpu.train.checkpoint import load_weights
        variables = load_weights(cfg, args.eval)
        maskiou_vars = variables.pop('maskiou', None)
        maps = evaluate_dataset(cfg, variables, make_eval_dataset(cfg),
                                maskiou_variables=maskiou_vars,
                                eval_batch_size=args.batch)
        out = os.path.join(args.out_dir, f'horizon_map_{args.config}.json')
        with open(out, 'w') as f:
            json.dump({'checkpoint': os.path.basename(args.eval),
                       'maps': maps}, f, indent=1)
        print(f'wrote {out}')
        return

    argv = ['--config', name, '--batch_size', str(args.batch),
            '--compute_dtype', args.dtype, '--num_workers', '4',
            '--validation_epoch', '0', '--save_interval', '1000000',
            '--log_folder', os.path.join(args.out_dir, 'horizon_logs'),
            '--save_folder', 'weights/']
    if args.lr is not None:
        argv += ['--lr', str(args.lr)]
    if args.resume is not None:
        argv += ['--resume', args.resume, '--start_iter', '-1']
    train(argv)
    plot_log(log_path, png_path)


if __name__ == '__main__':
    main()
