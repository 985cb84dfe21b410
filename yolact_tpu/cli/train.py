"""Training CLI — flag parity with the reference ``train.py:31-106``.

python -m yolact_tpu.cli.train --config=yolact_base_config --batch_size=8
"""

from __future__ import annotations

import argparse
import math
import signal
import time

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='YOLACT-TPU training')
    p.add_argument('--batch_size', default=8, type=int)
    p.add_argument('--resume', default=None, type=str,
                   help='checkpoint path, "interrupt", or "latest"')
    p.add_argument('--start_iter', default=-1, type=int)
    p.add_argument('--num_workers', default=4, type=int)
    p.add_argument('--lr', '--learning_rate', default=None, type=float)
    p.add_argument('--momentum', default=None, type=float)
    p.add_argument('--decay', '--weight_decay', default=None, type=float)
    p.add_argument('--gamma', default=None, type=float)
    p.add_argument('--save_folder', default='weights/', type=str)
    p.add_argument('--log_folder', default='logs/', type=str)
    p.add_argument('--config', default=None, type=str)
    p.add_argument('--save_interval', default=10000, type=int)
    p.add_argument('--validation_size', default=5000, type=int)
    p.add_argument('--validation_epoch', default=2, type=int)
    p.add_argument('--keep_latest', dest='keep_latest', action='store_true')
    p.add_argument('--keep_latest_interval', default=100000, type=int)
    p.add_argument('--dataset', default=None, type=str)
    p.add_argument('--no_log', dest='log', action='store_false')
    p.add_argument('--log_gpu', dest='log_gpu', action='store_true')
    p.add_argument('--no_interrupt', dest='interrupt', action='store_false')
    p.add_argument('--cuda', default=True, type=lambda v: str(v).lower()
                   in ('yes', 'true', 't', '1'),
                   help='accepted for CLI parity; device selection is '
                        'JAX\'s (train.py:49)')
    p.add_argument('--batch_alloc', default=None, type=str,
                   help='accepted for CLI parity; TPU chips are homogeneous '
                        'so per-device batch allocation is ignored')
    p.add_argument('--no_autoscale', dest='autoscale', action='store_false',
                   help='disable lr/iter scaling by batch_size/8 '
                        '(train.py:91-98)')
    p.add_argument('--max_gt', default=100, type=int,
                   help='fixed ground-truth padding per image (TPU static '
                        'shapes)')
    p.add_argument('--compute_dtype', default='float32', type=str)
    p.add_argument('--device_augment', dest='device_augment',
                   action='store_true',
                   help='run SSD augmentation on-device inside the train '
                        'step (data/device_augment.py); the host loader '
                        'only decodes+resizes — use when host CPUs cannot '
                        'feed the chip')
    p.add_argument('--distributed', dest='distributed', action='store_true',
                   help='multi-host: call jax.distributed.initialize() so '
                        'the mesh spans all TPU pod hosts (replaces the '
                        'reference, which has no multi-node support)')
    p.add_argument('--stem_s2d', dest='stem_s2d', action='store_true',
                   help='space-to-depth stem during training (ResNet '
                        'configs; same math, avoids the 3-channel '
                        'lane-padding tax on the 550x550 input)')
    p.add_argument('--train_remat', default=None,
                   choices=('none', 'dcn', 'all'),
                   help='backbone bottleneck rematerialization policy '
                        'for the backward pass (default: config value, '
                        "'dcn' — checkpoint DCN blocks; see "
                        'config.train_remat for the HBM numbers)')
    p.add_argument('--spatial_split', default=1, type=int,
                   help='shard the image-height dim across this many '
                        'devices (2-D data x space mesh; XLA inserts conv '
                        'halo exchanges).  For high-resolution configs '
                        'whose activations exceed one chip\'s HBM')
    p.set_defaults(keep_latest=False, log=True, log_gpu=False, interrupt=True,
                   autoscale=True, distributed=False, device_augment=False,
                   stem_s2d=False)
    return p.parse_args(argv)


def train(argv=None):
    args = parse_args(argv)

    if args.distributed:
        jax.distributed.initialize()

    from yolact_tpu.config import get_config, get_dataset
    from yolact_tpu.data.augmentations import SSDAugmentation
    from yolact_tpu.data.coco import COCODetection
    from yolact_tpu.data.loader import BatchLoader
    from yolact_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from yolact_tpu.train import checkpoint as ckpt
    from yolact_tpu.train.schedule import (apply_delayed_settings,
                                           scale_config_for_batch)
    from yolact_tpu.train.step import create_train_state, train_step
    from yolact_tpu.utils.functions import MovingAverage, SavePath
    from yolact_tpu.utils.logger import Log

    cfg = get_config(args.config or 'yolact_base')
    if args.dataset is not None:
        cfg = cfg.copy(dataset=get_dataset(args.dataset),)
    if args.autoscale and args.batch_size != 8:
        factor = args.batch_size / 8.0
        print(f'Scaling parameters by {factor:.2f} to account for a batch '
              f'size of {args.batch_size}.')
        cfg = scale_config_for_batch(cfg, args.batch_size)
    overrides = {}
    for k in ('lr', 'momentum', 'decay', 'gamma'):
        v = getattr(args, k)
        if v is not None:
            overrides[k] = v
    if args.compute_dtype != 'float32':
        overrides['compute_dtype'] = args.compute_dtype
    # freeze BN when the per-DATA-shard batch < 6 (train.py:115-118).
    # Mirror the mesh sizing below: the data axis is device_count /
    # spatial_split, trimmed to divide the batch — dividing by the raw
    # device count would wrongly freeze BN under --spatial_split
    n_data = max(1, jax.device_count() // max(1, args.spatial_split))
    while args.batch_size % n_data:
        n_data -= 1
    if args.batch_size // n_data < 6:
        print('Per-chip batch size is less than 6, auto-enabling freeze_bn.')
        overrides['freeze_bn'] = True
    if args.device_augment:
        overrides['use_device_augment'] = True
    if args.stem_s2d:
        overrides['stem_s2d'] = True
    if args.train_remat is not None:
        overrides['train_remat'] = args.train_remat
    if overrides:
        cfg = cfg.copy(**overrides)

    if cfg.use_device_augment:
        from yolact_tpu.data.augmentations import RawResize
        transform = RawResize(cfg)
    else:
        transform = SSDAugmentation(cfg)
    dataset = COCODetection(
        cfg.dataset.train_images, cfg.dataset.train_info,
        transform=transform, dataset_cfg=cfg.dataset)
    # host-augment lincomb configs ship pre-downsampled gt mask targets
    # (reference-exact soft-downsample-then-binarize + ~12x less transfer);
    # device_augment computes its own on chip, DIRECT needs full-res masks
    multires = None
    from yolact_tpu.config import MaskType
    if (cfg.mask_type == MaskType.LINCOMB
            and cfg.mask_proto_binarize_downsampled_gt
            and not cfg.use_device_augment):
        from yolact_tpu.ops.anchors import proto_size, seg_size
        multires = {'proto': proto_size(cfg),
                    'seg': seg_size(cfg)
                    if cfg.use_semantic_segmentation_loss else None}
    loader = BatchLoader(dataset, args.batch_size, max_gt=args.max_gt,
                         num_workers=args.num_workers,
                         pack_images=cfg.use_device_augment,
                         multires=multires)

    model, state = create_train_state(cfg)
    start_iter = max(args.start_iter, 0)
    if args.resume is not None:
        path = ckpt.resolve_resume(args.resume, args.save_folder, cfg.name)
        if path is None:
            raise FileNotFoundError(f'no checkpoint for --resume={args.resume}')
        print(f'Resuming training from {path}...')
        if path.endswith('.pth'):
            variables = ckpt.load_weights(cfg, path)
            new_params = dict(state.params, model=variables['params'])
            if 'maskiou' in variables and 'maskiou' in state.params:
                new_params['maskiou'] = variables['maskiou']['params']
            state = state.replace(params=new_params,
                                  batch_stats=variables.get('batch_stats',
                                                            state.batch_stats))
        else:
            state = ckpt.load_checkpoint(path, state)
        if args.start_iter == -1:
            try:
                start_iter = ckpt.iteration_from_path(path)
            except Exception:
                start_iter = int(state.step)
    else:
        # init_weights (yolact.py:492-547, train.py:211-213): pretrained
        # backbone + focal conf-bias; non-backbone convs already carry
        # xavier init from module creation (models/layers.py)
        import os
        from yolact_tpu.convert.backbone_import import (focal_bias_init,
                                                        load_backbone_weights,
                                                        merge_backbone)
        variables = {'params': jax.device_get(state.params['model']),
                     'batch_stats': jax.device_get(state.batch_stats)}
        bb_path = os.path.join(args.save_folder, cfg.backbone.path)
        if os.path.exists(bb_path):
            print(f'Initializing weights from {bb_path}...')
            variables = merge_backbone(variables,
                                       load_backbone_weights(cfg, bb_path))
        else:
            print(f'Backbone weights {bb_path} not found; training the '
                  'backbone from random init (the reference errors here — '
                  'kept runnable for from-scratch/synthetic workflows).')
        variables = focal_bias_init(cfg, variables)
        state = state.replace(params=dict(state.params,
                                          model=variables['params']),
                              batch_stats=variables.get('batch_stats',
                                                        state.batch_stats))
    state = state.replace(step=np.int32(start_iter))

    # 1-D data mesh over the largest device count dividing the batch
    # (2-D data x space when --spatial_split > 1)
    devices = jax.devices()
    n_data = len(devices) // args.spatial_split
    while args.batch_size % n_data:
        n_data -= 1
    n_use = n_data * args.spatial_split
    if n_use < len(devices):
        print(f'batch_size {args.batch_size} / spatial_split '
              f'{args.spatial_split} leaves {n_use} of '
              f'{len(devices)} devices in the mesh.')
    if args.spatial_split > 1:
        from yolact_tpu.parallel.mesh import (make_mesh_2d,
                                              shard_batch_spatial)
        mesh = make_mesh_2d(devices[:n_use], data=n_data,
                            space=args.spatial_split)
        shard_batch = shard_batch_spatial  # noqa: F811 (same signature)
    else:
        mesh = make_mesh(devices[:n_use])
    state = jax.device_put(state, replicate(mesh))

    def make_step_fn(c):
        # bind the config explicitly: jit bakes it into the trace, so
        # delayed_settings must rebuild this (a closure over the loop's
        # `cfg` variable would silently keep the ORIGINAL settings)
        return jax.jit(lambda s, b, r: train_step(c, model, s, b, r),
                       donate_argnums=(0,))

    step_fn = make_step_fn(cfg)

    log = Log(cfg.name, args.log_folder,
              dict(args=vars(args), config_name=cfg.name),
              overwrite=(args.resume is None),  # reference train.py:193
              log_gpu_stats=args.log_gpu) if args.log else None

    epoch_size = len(dataset) // args.batch_size
    num_epochs = math.ceil(cfg.max_iter / epoch_size)
    loss_avgs = {}
    rng = jax.random.PRNGKey(42)
    iteration = start_iter
    last_time = time.time()
    time_avg = MovingAverage()

    interrupted = {'flag': False}

    def on_sigint(sig, frame):
        interrupted['flag'] = True

    if args.interrupt:
        signal.signal(signal.SIGINT, on_sigint)

    print('Begin training!\n')
    try:
        for epoch in range(num_epochs):
            if (epoch + 1) * epoch_size < iteration:
                continue
            for _ in range(epoch_size):
                if iteration == (epoch + 1) * epoch_size:
                    break
                if iteration >= cfg.max_iter or interrupted['flag']:
                    break
                new_cfg = apply_delayed_settings(cfg, iteration)
                if new_cfg is not cfg:
                    print(f'(delayed settings applied at iter {iteration}; '
                          'recompiling train step)')
                    cfg = new_cfg
                    step_fn = make_step_fn(cfg)

                batch = loader.next_batch()
                batch = shard_batch(mesh, batch)
                rng, step_rng = jax.random.split(rng)
                state, losses = step_fn(state, batch, step_rng)

                iteration += 1
                cur_time = time.time()
                elapsed = cur_time - last_time
                time_avg.add(elapsed)
                last_time = cur_time

                if iteration % 10 == 0:
                    losses_np = {k: float(v) for k, v in losses.items()}
                    for k, v in losses_np.items():
                        if k not in ('total', 'lr'):
                            # sampled every 10th iter (avoids a device
                            # sync per step), so a 10-deep window spans
                            # the reference's 100-iteration average
                            loss_avgs.setdefault(k, MovingAverage(10)).add(v)
                    letters = [k for k in losses_np if k not in ('total', 'lr')]
                    eta = (cfg.max_iter - iteration) * time_avg.get_avg()
                    eta_str = str(int(eta // 3600)) + ':' + \
                        f'{int(eta % 3600 // 60):02d}:{int(eta % 60):02d}'
                    parts = ' | '.join(
                        f'{k}: {loss_avgs[k].get_avg():.3f}' for k in letters)
                    total = sum(loss_avgs[k].get_avg() for k in letters)
                    print(f'[{epoch:3d}] {iteration:7d} || {parts} | '
                          f'T: {total:.3f} || ETA: {eta_str} || '
                          f'timer: {time_avg.get_avg():.3f}')
                    if log is not None:
                        log.log('train', loss={k: losses_np.get(k)
                                               for k in letters},
                                lr=losses_np.get('lr'),
                                epoch=epoch, iter=iteration,
                                elapsed=elapsed)

                if iteration % args.save_interval == 0 and iteration > 0:
                    latest = SavePath.get_latest(args.save_folder, cfg.name) \
                        if args.keep_latest else None
                    path = SavePath(cfg.name, epoch, iteration).get_path(
                        root=args.save_folder)
                    print(f'Saving state, iter: {iteration}')
                    ckpt.save_checkpoint(state, path)
                    if args.keep_latest:
                        ckpt.prune_previous_checkpoint(
                            latest, iteration, args.save_interval,
                            args.keep_latest_interval)

            if iteration >= cfg.max_iter or interrupted['flag']:
                break

            if args.validation_epoch > 0 and epoch % args.validation_epoch \
                    == 0 and epoch > 0:
                compute_validation_map(cfg, state, args, log, epoch, iteration)
    finally:
        loader.stop()

    if interrupted['flag']:
        print('Stopping early. Saving network...')
        SavePath.remove_interrupt(args.save_folder)
        path = SavePath(cfg.name, epoch, f'{iteration}_interrupt').get_path(
            root=args.save_folder)
        ckpt.save_checkpoint(state, path)
        return

    path = SavePath(cfg.name, epoch, iteration).get_path(
        root=args.save_folder)
    ckpt.save_checkpoint(state, path)

    # validation mAP on the final weights (reference train.py:384-385
    # computes it after the training loop)
    if args.validation_epoch > 0:
        compute_validation_map(cfg, state, args, log, epoch, iteration)


def compute_validation_map(cfg, state, args, log, epoch, iteration):
    """Per-epoch val mAP (train.py:369-374,485-498)."""
    from yolact_tpu.eval.evaluate import evaluate_dataset, make_eval_dataset
    try:
        val_dataset = make_eval_dataset(cfg)
    except FileNotFoundError:
        print('(validation dataset unavailable; skipping val mAP)')
        return
    variables = {'params': jax.device_get(state.params['model']),
                 'batch_stats': jax.device_get(state.batch_stats)}
    maskiou_vars = None
    if cfg.use_maskiou and 'maskiou' in state.params:
        # val mAP must rescore with the same head the final model ships
        maskiou_vars = {'params': jax.device_get(state.params['maskiou'])}
    start = time.time()
    maps = evaluate_dataset(cfg, variables, val_dataset,
                            maskiou_variables=maskiou_vars,
                            max_images=args.validation_size, quiet=False)
    if log is not None and maps is not None:
        log.log('val', box=maps['box'], mask=maps['mask'], epoch=epoch,
                iter=iteration, elapsed=time.time() - start)


if __name__ == '__main__':
    train()
