"""Quantitative COCO evaluation driver.

Port of the reference ``evaluate`` loop (``eval.py:870-1003``): deterministic
badhash image order, forward + detection, greedy AP matching into
APDataObject, final calc_map table; optional COCO-json output mode.

TPU-shaped beyond the reference: images are prefetched by a host thread and
processed in fixed-size device batches (``eval_batch_size``) through ONE
jitted program (forward + fast-NMS + Pallas mask assembly); the host only
decodes images, upsamples the padded proto-res masks, and updates AP state.
"""

from __future__ import annotations

import queue
import random as _random
import threading
from typing import Dict, Optional

import jax
import numpy as np

from yolact_tpu.config import MaskType, YolactConfig
from yolact_tpu.data.augmentations import BaseTransform
from yolact_tpu.data.coco import COCODetection
from yolact_tpu.detect.postprocess import finish_masks, finish_masks_direct
from yolact_tpu.eval.coco_json import DetectionsWriter
from yolact_tpu.eval.evaluator import (badhash, calc_map, make_ap_data,
                                       prep_metrics)
from yolact_tpu.infer import Pipeline
from yolact_tpu.utils import timer
from yolact_tpu.utils.functions import MovingAverage, ProgressBar


def sanitize_boxes_np(boxes: np.ndarray, w: int, h: int) -> np.ndarray:
    """Relative point-form -> absolute int boxes (output_utils.py:97-99)."""
    x1 = np.minimum(boxes[:, 0], boxes[:, 2]) * w
    x2 = np.maximum(boxes[:, 0], boxes[:, 2]) * w
    y1 = np.minimum(boxes[:, 1], boxes[:, 3]) * h
    y2 = np.maximum(boxes[:, 1], boxes[:, 3]) * h
    out = np.stack([np.clip(x1, 0, w), np.clip(y1, 0, h),
                    np.clip(x2, 0, w), np.clip(y2, 0, h)], axis=1)
    return out.astype(np.int64)


class _PrefetchError:
    """Sentinel carrying a prefetcher exception to the consumer."""

    def __init__(self, exc):
        import traceback
        self.exc = exc
        self.tb = traceback.format_exc()


def _prefetcher(dataset, indices, out_q, stop):
    """Stop-aware prefetch: bounded puts use a timeout so a dying consumer
    (stop set in its finally) can't strand this thread on a full queue,
    and any pull_item exception is forwarded instead of silently killing
    the thread (which would hang the consumer's blocking get forever)."""
    import queue as _queue

    def put(x):
        while not stop.is_set():
            try:
                out_q.put(x, timeout=0.25)
                return True
            except _queue.Full:
                continue
        return False

    try:
        for idx in indices:
            if stop.is_set():
                return
            item = dataset.pull_item(idx)
            if not put((idx, item)):
                return
    except BaseException as e:
        put(_PrefetchError(e))
        return
    put(None)


def evaluate_dataset(cfg: YolactConfig, variables: Dict,
                     dataset: COCODetection,
                     maskiou_variables: Optional[Dict] = None,
                     max_images: int = -1,
                     eval_batch_size: int = 1,
                     fast_nms: bool = True,
                     cross_class_nms: bool = False,
                     score_threshold: float = 0.0,
                     crop_masks: bool = True,
                     shuffle: bool = False,
                     no_sort: bool = False,
                     output_coco_json: bool = False,
                     bbox_det_file: str = 'results/bbox_detections.json',
                     mask_det_file: str = 'results/mask_detections.json',
                     output_web_json: bool = False,
                     web_det_path: str = 'web/dets/',
                     benchmark: bool = False,
                     mask_proto_debug: bool = False,
                     ap_data_file: Optional[str] = None,
                     display: bool = False,
                     display_dir: str = 'displays/',
                     top_k: int = 15,
                     device_mask_iou: Optional[bool] = None,
                     quiet: bool = False,
                     no_bar: bool = False,
                     n_devices: int = 1) -> Optional[Dict]:
    """Returns the all_maps dict (or None for json/benchmark modes).

    ``n_devices > 1`` shards each eval batch over a 1-D device mesh
    (batch dim over 'data'; XLA SPMD runs the forward data-parallel) —
    multi-chip dataset evaluation, which the reference's DataParallel
    only offers for video (eval.py:630-634).  ``eval_batch_size`` is
    rounded up to a multiple of ``n_devices`` (logged) so every device
    gets an equal shard.
    """
    mesh = None
    if n_devices > 1:
        from yolact_tpu.parallel.mesh import batch_sharding, make_mesh
        local = jax.local_devices()
        if n_devices > len(local):
            raise ValueError(
                f'--eval_devices={n_devices} but only {len(local)} local '
                f'devices are attached')
        if eval_batch_size % n_devices:
            rounded = -(-eval_batch_size // n_devices) * n_devices
            if not quiet:
                print(f'eval_batch_size {eval_batch_size} not divisible by '
                      f'{n_devices} devices; using {rounded}')
            eval_batch_size = rounded
        mesh = make_mesh(local[:n_devices])
        _batch_sharding = batch_sharding(mesh)
    if fast_nms:
        pipeline = Pipeline(cfg, variables,
                            maskiou_variables=maskiou_variables,
                            use_cross_class_nms=cross_class_nms,
                            preprocess=False,
                            score_threshold=score_threshold,
                            crop_masks=crop_masks)
    else:
        # traditional greedy NMS path: device does forward+decode+scores,
        # the per-class O(n^2) suppression runs in the native C++ lib and
        # mask assembly on the host (detection.py:182-228 semantics)
        from yolact_tpu.eval.traditional import TraditionalPipeline
        pipeline = TraditionalPipeline(cfg, variables,
                                       score_threshold=score_threshold,
                                       preprocess=False,
                                       maskiou_variables=maskiou_variables,
                                       crop_masks=crop_masks)

    dataset_size = len(dataset) if max_images < 0 else \
        min(max_images, len(dataset))
    progress_bar = ProgressBar(30, dataset_size)
    frame_times = MovingAverage()

    dataset_indices = list(range(len(dataset)))
    if shuffle:
        _random.shuffle(dataset_indices)
    elif not no_sort:
        hashed = [badhash(x) for x in dataset.ids]
        dataset_indices.sort(key=lambda x: hashed[x])
    dataset_indices = dataset_indices[:dataset_size]

    compute_map = not output_coco_json and not benchmark
    ap_data = make_ap_data(len(cfg.dataset.class_names))
    detections = DetectionsWriter(cfg)

    # device-side mask upsample + mask IoU (eval/device_metrics.py):
    # replaces ~0.5 s/image of host cv2/numpy work with one jitted call;
    # exact same numerics (torch-style bilinear upsample + 0.5 binarise).
    if device_mask_iou is None:
        from jax.extend import backend as _jax_backend
        device_mask_iou = _jax_backend.get_backend().platform == 'tpu'
    # the device metrics path upsamples canvas-global proto-res masks;
    # direct masks (mask_type=0) are box-local patches, host path only
    use_dev_miou = (device_mask_iou and compute_map and not display
                    and cfg.mask_type == MaskType.LINCOMB)
    if use_dev_miou:
        from yolact_tpu.eval.device_metrics import (dataset_canvas_size,
                                                    gt_to_canvas_packed,
                                                    mask_iou_device_packed)
        canvas = dataset_canvas_size(dataset)
        if canvas > 1024:
            # device metrics materialize [G, canvas, canvas] gt on chip;
            # beyond 1k^2 the memory/compile cost stops paying — use the
            # host path (COCO maxes at 640, so this is custom data)
            if not quiet:
                print(f'images up to {canvas}px exceed the device-metrics '
                      'canvas; computing mask IoU on host')
            use_dev_miou = False

    item_q: "queue.Queue" = queue.Queue(maxsize=2 * eval_batch_size + 2)
    stop = threading.Event()
    threading.Thread(target=_prefetcher,
                     args=(dataset, dataset_indices, item_q, stop),
                     daemon=True).start()

    import time
    done = 0
    pending = []  # (image_idx, item)
    exhausted = False
    t_last = time.perf_counter()
    try:
        while done < dataset_size:
            while len(pending) < eval_batch_size and not exhausted:
                got = item_q.get()
                if got is None:
                    exhausted = True
                    break
                if isinstance(got, _PrefetchError):
                    raise RuntimeError(
                        f'eval prefetch failed:\n{got.tb}') from got.exc
                pending.append(got)
            if not pending:
                break
            batch_items = pending[:eval_batch_size]
            pending = pending[len(batch_items):]
            n_real = len(batch_items)

            with timer.env('Network'):
                imgs = np.stack([np.asarray(it[1][0]) for it in batch_items])
                if n_real < eval_batch_size:
                    imgs = np.concatenate(
                        [imgs, np.repeat(imgs[-1:],
                                         eval_batch_size - n_real, 0)])
                if mesh is not None:
                    imgs = jax.device_put(imgs, _batch_sharding)
                out = pipeline(imgs)
                valid_all = np.asarray(out.valid)

            if mask_proto_debug and done == 0:
                import os
                os.makedirs('scripts', exist_ok=True)
                from yolact_tpu.models.yolact import Yolact
                preds = Yolact(cfg).apply(variables, imgs[:1])
                np.save('scripts/proto.npy', np.asarray(preds['proto'][0]))
                if batch_items[0][1][2] is not None:
                    np.save('scripts/gt.npy',
                            np.asarray(batch_items[0][1][2]))

            for bi, (image_idx, item) in enumerate(batch_items):
                img, gt, gt_masks, h, w, num_crowd = item
                now = time.perf_counter()
                if done > 1:
                    # skip the first two frames like the reference
                    # (eval.py:963-965) — the first batch pays the full
                    # XLA compile, which would dominate the average
                    frame_times.add(now - t_last)
                t_last = now
                done += 1
                if benchmark:
                    continue

                n = int(valid_all[bi].sum())
                classes = np.asarray(out.classes[bi])[:n]
                box_scores = np.asarray(out.scores[bi])[:n]
                if out.mask_scores is not None and cfg.rescore_mask:
                    mask_scores = np.asarray(out.mask_scores[bi])[:n]
                    if cfg.rescore_bbox:
                        box_scores = mask_scores
                else:
                    mask_scores = box_scores
                boxes_rel = np.asarray(out.boxes[bi])[:n]

                miou_full = crowd_full = None
                masks_full = None
                with timer.env('Postprocess'):
                    boxes_abs = sanitize_boxes_np(boxes_rel, w, h)
                    if use_dev_miou and gt is not None:
                        import jax.numpy as jnp
                        gt_packed = gt_to_canvas_packed(
                            np.asarray(gt_masks), canvas)
                        miou_d, crowd_d, _pa_d = mask_iou_device_packed(
                            out.masks[bi], jnp.asarray(gt_packed),
                            np.float32(h), np.float32(w), canvas)
                        miou_full = np.asarray(miou_d)[:n]
                        crowd_full = np.asarray(crowd_d)[:n]
                    elif cfg.mask_type == MaskType.DIRECT:
                        patches = np.asarray(out.masks[bi])[:n]
                        masks_full = finish_masks_direct(patches, boxes_abs,
                                                         w, h)
                    else:
                        proto_masks = np.asarray(out.masks[bi])[:n]
                        masks_full = finish_masks(proto_masks, w, h)
                # NOTE: cfg.discard_mask_area is TRAINING-only in the
                # reference (maskiou gt filter, multibox_loss.py:630-632);
                # eval never drops detections by mask area

                if display:
                    # headless display mode: render detections over the
                    # original image to display_dir (the reference pops a
                    # matplotlib window, eval.py:945-961)
                    import os
                    import cv2
                    from yolact_tpu.eval.display import draw_detections
                    os.makedirs(display_dir, exist_ok=True)
                    raw = dataset.pull_image(image_idx)
                    # prep_display forces rescore_bbox=True (eval.py:147-149)
                    disp_scores = mask_scores if cfg.rescore_mask \
                        else box_scores
                    drawn = draw_detections(
                        cfg, raw, classes, disp_scores, boxes_abs, masks_full,
                        top_k=top_k, score_threshold=score_threshold)
                    cv2.imwrite(os.path.join(
                        display_dir, f'{dataset.ids[image_idx]}.png'), drawn)

                if output_coco_json:
                    with timer.env('JSON Output'):
                        image_id = dataset.ids[image_idx]
                        for i in range(n):
                            if (boxes_abs[i, 3] - boxes_abs[i, 1]) * \
                                    (boxes_abs[i, 2] - boxes_abs[i, 0]) > 0:
                                detections.add_bbox(image_id, classes[i],
                                                    boxes_abs[i],
                                                    box_scores[i])
                                detections.add_mask(image_id, classes[i],
                                                    masks_full[i],
                                                    mask_scores[i])
                elif compute_map and gt is not None:
                    gt = np.asarray(gt)
                    gt_boxes = gt[:, :4].copy()
                    gt_boxes[:, [0, 2]] *= w
                    gt_boxes[:, [1, 3]] *= h
                    with timer.env('Main loop'):
                        prep_metrics(ap_data, classes, box_scores,
                                     mask_scores, boxes_abs, masks_full,
                                     gt_boxes, gt[:, 4].astype(int),
                                     None if miou_full is not None
                                     else np.asarray(gt_masks), num_crowd,
                                     mask_iou_full=miou_full,
                                     crowd_mask_iou_full=crowd_full)

                if not quiet and not no_bar:
                    fps = 1 / frame_times.get_avg() if len(frame_times) \
                        else 0
                    progress_bar.set_val(done)
                    print(f'\rProcessing Images  {progress_bar} '
                          f'{done:6d} / {dataset_size:6d} '
                          f'({done * 100 / dataset_size:5.2f}%) '
                          f'{fps:7.2f} fps ', end='')
    finally:
        stop.set()

    if not quiet and not no_bar:
        print()

    if benchmark:
        print()
        print('Stats for the last frame:')
        timer.print_stats()
        avg = frame_times.get_avg() if len(frame_times) else float('nan')
        print(f'Average: {avg * 1000:5.2f} ms / frame ({1 / avg:5.2f} fps)')
        return None

    if output_coco_json:
        import os
        os.makedirs(os.path.dirname(bbox_det_file) or '.', exist_ok=True)
        detections.dump(bbox_det_file, mask_det_file)
        if output_web_json:
            detections.dump_web(web_det_path)
        return None

    if ap_data_file:
        # raw AP state dump for --resume (eval.py ap_data_file flow)
        import os
        import pickle
        os.makedirs(os.path.dirname(ap_data_file) or '.', exist_ok=True)
        with open(ap_data_file, 'wb') as f:
            pickle.dump(ap_data, f)

    return calc_map(ap_data, cfg.dataset.class_names, print_table=not quiet)


def calc_map_from_file(cfg: YolactConfig, ap_data_file: str) -> Dict:
    """Recompute the mAP table from a saved ap_data pickle
    (eval.py --resume)."""
    import pickle
    with open(ap_data_file, 'rb') as f:
        ap_data = pickle.load(f)
    return calc_map(ap_data, cfg.dataset.class_names)


def make_eval_dataset(cfg: YolactConfig) -> COCODetection:
    return COCODetection(cfg.dataset.valid_images, cfg.dataset.valid_info,
                         transform=BaseTransform(cfg),
                         dataset_cfg=cfg.dataset,
                         has_gt=cfg.dataset.has_gt)
