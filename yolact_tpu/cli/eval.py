"""Evaluation / inference CLI — flag parity with the reference
``eval.py:40-128``.

python -m yolact_tpu.cli.eval --trained_model=weights/yolact_base_54_800000.pth
python -m yolact_tpu.cli.eval --trained_model=... --image=in.jpg:out.jpg
python -m yolact_tpu.cli.eval --trained_model=... --video=in.mp4:out.mp4
"""

from __future__ import annotations

import argparse
import os
import random


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='YOLACT-TPU evaluation')
    p.add_argument('--trained_model', default='weights/yolact_base_54_800000.pth',
                   type=str)
    p.add_argument('--top_k', default=5, type=int)
    p.add_argument('--cuda', default=True, type=str2bool,
                   help='accepted for CLI parity; device selection is JAX\'s')
    p.add_argument('--fast_nms', default=True, type=str2bool)
    p.add_argument('--cross_class_nms', default=False, type=str2bool)
    p.add_argument('--display_masks', default=True, type=str2bool)
    p.add_argument('--display_bboxes', default=True, type=str2bool)
    p.add_argument('--display_text', default=True, type=str2bool)
    p.add_argument('--display_scores', default=True, type=str2bool)
    p.add_argument('--display', dest='display', action='store_true')
    p.add_argument('--shuffle', dest='shuffle', action='store_true')
    p.add_argument('--ap_data_file', default='results/ap_data.pkl', type=str)
    p.add_argument('--resume', dest='resume', action='store_true',
                   help='resume mAP from ap_data_file')
    p.add_argument('--max_images', default=-1, type=int)
    p.add_argument('--output_coco_json', dest='output_coco_json',
                   action='store_true')
    p.add_argument('--bbox_det_file', default='results/bbox_detections.json',
                   type=str)
    p.add_argument('--mask_det_file', default='results/mask_detections.json',
                   type=str)
    p.add_argument('--config', default=None)
    p.add_argument('--output_web_json', dest='output_web_json',
                   action='store_true')
    p.add_argument('--web_det_path', default='web/dets/', type=str)
    p.add_argument('--no_bar', dest='no_bar', action='store_true')
    p.add_argument('--display_lincomb', default=False, type=str2bool)
    p.add_argument('--benchmark', default=False, dest='benchmark',
                   action='store_true')
    p.add_argument('--no_sort', default=False, dest='no_sort',
                   action='store_true')
    p.add_argument('--seed', default=None, type=int)
    p.add_argument('--mask_proto_debug', default=False, dest='mask_proto_debug',
                   action='store_true')
    p.add_argument('--no_crop', dest='crop', action='store_false')
    p.add_argument('--image', default=None, type=str)
    p.add_argument('--images', default=None, type=str)
    p.add_argument('--video', default=None, type=str)
    p.add_argument('--video_multiframe', default=1, type=int)
    p.add_argument('--score_threshold', default=0, type=float)
    p.add_argument('--eval_batch_size', default=1, type=int,
                   help='device batch for dataset evaluation (TPU '
                        'throughput knob; no reference equivalent)')
    p.add_argument('--eval_devices', default=1, type=int,
                   help='shard each eval batch over this many chips '
                        '(1-D data mesh; 0 = all local devices)')
    p.add_argument('--dataset', default=None, type=str)
    p.add_argument('--detect', default=False, dest='detect',
                   action='store_true',
                   help='run as a detector only (no mask branch eval)')
    p.add_argument('--display_fps', default=False, dest='display_fps',
                   action='store_true')
    p.add_argument('--emulate_playback', default=False,
                   dest='emulate_playback', action='store_true')
    p.add_argument('--stem_s2d', default=False, dest='stem_s2d',
                   action='store_true',
                   help='space-to-depth stem for the dataset-eval path '
                        '(raw-image pipelines enable it automatically); '
                        'numerically equivalent — exposed for mAP A/B')
    p.set_defaults(no_bar=False, display=False, resume=False, detect=False,
                   display_fps=False, emulate_playback=False, crop=True)
    return p.parse_args(argv)


def str2bool(v):
    if isinstance(v, bool):
        return v
    return v.lower() in ('yes', 'true', 't', '1')


def load_model(args):
    from yolact_tpu.config import (config_from_model_path, get_config,
                                   get_dataset)
    from yolact_tpu.train.checkpoint import load_weights

    if args.config is None:
        cfg = config_from_model_path(args.trained_model)
        print(f'Config not specified. Parsed {cfg.name}_config from the '
              f'file name.\n')
    else:
        cfg = get_config(args.config)
    if args.dataset is not None:
        cfg = cfg.copy(dataset=get_dataset(args.dataset))
    if args.detect:
        cfg = cfg.copy(eval_mask_branch=False)
    if args.stem_s2d:
        cfg = cfg.copy(stem_s2d=True)

    variables = load_weights(cfg, args.trained_model)
    maskiou_vars = variables.pop('maskiou', None) if isinstance(
        variables, dict) else None
    return cfg, variables, maskiou_vars


def make_image_pipeline(cfg, variables, maskiou_vars, args):
    """One jitted pipeline reused across images (a fresh Pipeline per file
    would recompile the whole model for every frame of --images)."""
    from yolact_tpu.infer import Pipeline

    if args.fast_nms:
        return Pipeline(cfg, variables, maskiou_variables=maskiou_vars,
                        preprocess=True,
                        use_cross_class_nms=args.cross_class_nms,
                        score_threshold=args.score_threshold,
                        crop_masks=args.crop)
    # host greedy per-class NMS (the reference's --fast_nms=False)
    from yolact_tpu.eval.traditional import TraditionalPipeline
    return TraditionalPipeline(cfg, variables,
                               score_threshold=args.score_threshold,
                               preprocess=True,
                               maskiou_variables=maskiou_vars,
                               crop_masks=args.crop)


def evalimage(cfg, variables, args, pipeline, path: str, save_path=None):
    """Single-image inference (eval.py:595-610)."""
    import cv2
    import numpy as np
    from yolact_tpu.config import MaskType
    from yolact_tpu.detect.postprocess import (finish_masks,
                                               finish_masks_direct)
    from yolact_tpu.eval.display import draw_detections
    from yolact_tpu.eval.evaluate import sanitize_boxes_np

    img = cv2.imread(path)
    h, w = img.shape[:2]
    out = pipeline(img.astype(np.float32)[None])

    if args.display_lincomb:
        if cfg.mask_type == MaskType.DIRECT:
            print('--display_lincomb: direct-mask config has no prototype '
                  'combination to display; skipping')
        else:
            # prototype-combination debug viz (output_utils.py:147-189)
            from yolact_tpu.detect.detection import detect as detect_fn
            from yolact_tpu.eval.display import display_lincomb
            from yolact_tpu.infer import (preprocess_device,
                                          preprocess_device_s2d)
            from yolact_tpu.models.yolact import Yolact
            pre = preprocess_device_s2d if cfg.stem_s2d else preprocess_device
            preds = Yolact(cfg).apply(
                variables, pre(cfg, img.astype(np.float32)[None]))
            d = detect_fn(cfg, preds)
            display_lincomb(np.asarray(d.proto[0]), np.asarray(d.masks[0]),
                            out_path=os.path.splitext(path)[0]
                            + '_lincomb.png')
    n = int(np.asarray(out.valid[0]).sum())
    # the reference's prep_display forces rescore_bbox=True during display
    # (eval.py:147-149), so plus configs show maskiou-rescored scores
    scores = np.asarray(out.scores[0])[:n]
    if out.mask_scores is not None and cfg.rescore_mask:
        scores = np.asarray(out.mask_scores[0])[:n]
    boxes_abs = sanitize_boxes_np(np.asarray(out.boxes[0])[:n], w, h)
    if cfg.mask_type == MaskType.DIRECT:
        # box-local patches, not canvas-global proto masks
        # (output_utils.py:101-120)
        masks = finish_masks_direct(np.asarray(out.masks[0])[:n],
                                    boxes_abs, w, h)
    else:
        masks = finish_masks(np.asarray(out.masks[0])[:n], w, h)
    drawn = draw_detections(
        cfg, img, np.asarray(out.classes[0])[:n],
        scores, boxes_abs, masks,
        top_k=args.top_k, score_threshold=args.score_threshold,
        display_masks=args.display_masks, display_bboxes=args.display_bboxes,
        display_text=args.display_text, display_scores=args.display_scores)
    if save_path is None:
        save_path = os.path.splitext(path)[0] + '_out.png'
    cv2.imwrite(save_path, drawn)
    print(f'Saved to {save_path}')


def evalimages(cfg, variables, maskiou_vars, args, inp: str, out: str):
    os.makedirs(out, exist_ok=True)
    pipeline = make_image_pipeline(cfg, variables, maskiou_vars, args)
    for name in sorted(os.listdir(inp)):
        path = os.path.join(inp, name)
        save = os.path.join(out, os.path.splitext(name)[0] + '.png')
        evalimage(cfg, variables, args, pipeline, path, save)
    print('Done.')


def main(argv=None):
    args = parse_args(argv)
    if args.seed is not None:
        random.seed(args.seed)

    cfg, variables, maskiou_vars = load_model(args)
    print('Model loaded.\n')

    if args.image is not None:
        pipeline = make_image_pipeline(cfg, variables, maskiou_vars, args)
        if ':' in args.image:
            inp, out = args.image.split(':')
            evalimage(cfg, variables, args, pipeline, inp, out)
        else:
            evalimage(cfg, variables, args, pipeline, args.image)
        return
    if args.images is not None:
        inp, out = args.images.split(':')
        evalimages(cfg, variables, maskiou_vars, args, inp, out)
        return
    if args.video is not None:
        from yolact_tpu.eval.video import evalvideo
        if ':' in args.video:
            inp, out = args.video.split(':')
        else:
            inp, out = args.video, None
        evalvideo(cfg, variables, inp, out,
                  video_multiframe=args.video_multiframe,
                  maskiou_variables=maskiou_vars,
                  score_threshold=args.score_threshold,
                  top_k=args.top_k, display_fps=args.display_fps,
                  emulate_playback=args.emulate_playback,
                  display=args.display,
                  fast_nms=args.fast_nms,
                  cross_class_nms=args.cross_class_nms,
                  crop_masks=args.crop)
        return

    from yolact_tpu.eval.evaluate import (calc_map_from_file,
                                          evaluate_dataset, make_eval_dataset)
    if args.resume:
        calc_map_from_file(cfg, args.ap_data_file)
        return
    dataset = make_eval_dataset(cfg)
    if args.eval_devices == 0:
        import jax
        n_eval_devices = len(jax.local_devices())
    else:
        n_eval_devices = args.eval_devices
    evaluate_dataset(
        cfg, variables, dataset, maskiou_variables=maskiou_vars,
        eval_batch_size=args.eval_batch_size,
        n_devices=n_eval_devices,
        max_images=args.max_images, fast_nms=args.fast_nms,
        cross_class_nms=args.cross_class_nms,
        score_threshold=args.score_threshold, crop_masks=args.crop,
        shuffle=args.shuffle, no_sort=args.no_sort,
        output_coco_json=args.output_coco_json,
        bbox_det_file=args.bbox_det_file, mask_det_file=args.mask_det_file,
        output_web_json=args.output_web_json, web_det_path=args.web_det_path,
        benchmark=args.benchmark, mask_proto_debug=args.mask_proto_debug,
        ap_data_file=args.ap_data_file, display=args.display,
        top_k=args.top_k, no_bar=args.no_bar)


if __name__ == '__main__':
    main()
