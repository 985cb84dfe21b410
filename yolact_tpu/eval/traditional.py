"""Traditional (greedy, per-class) NMS — host path.

Semantics of ``Detect.traditional_nms`` (``detection.py:182-228``): per-class
confidence filter, greedy suppression with +1-convention pixel areas (boxes
scaled by max_size), global score sort capped at ``max_num_detections``.
The O(n²) suppression loop runs in the native C++ library
(``native/yolact_native.cpp``) — the TPU-era replacement for the reference's
on-the-fly-compiled Cython (``utils/cython_nms.pyx``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from yolact_tpu.config import YolactConfig
from yolact_tpu.native import get_native


def _greedy_nms(dets: np.ndarray, thresh: float) -> np.ndarray:
    native = get_native()
    if native is not None:
        keep = native.greedy_nms(dets, thresh)
        return np.sort(keep)  # reference returns original-order indices
    # numpy fallback
    x1, y1, x2, y2, sc = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = sc.argsort()[::-1]
    suppressed = np.zeros(len(dets), bool)
    keep = []
    for _i in range(len(order)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        for _j in range(_i + 1, len(order)):
            j = order[_j]
            if suppressed[j]:
                continue
            w = max(0.0, min(x2[i], x2[j]) - max(x1[i], x1[j]) + 1)
            h = max(0.0, min(y2[i], y2[j]) - max(y1[i], y1[j]) + 1)
            inter = w * h
            if inter / (areas[i] + areas[j] - inter) >= thresh:
                suppressed[j] = True
    return np.array(sorted(keep), np.int64)


def host_assemble_masks(proto: np.ndarray, coeffs: np.ndarray,
                        boxes: np.ndarray, padding: int = 1,
                        crop: bool = True) -> np.ndarray:
    """Host mask assembly for the traditional-NMS path: sigmoid(proto @
    coeffs.T) cropped by boxes (output_utils.py:69-74), numpy."""
    hp, wp, _ = proto.shape
    n = coeffs.shape[0]
    m = proto.reshape(-1, proto.shape[-1]) @ coeffs.T          # [hp*wp, n]
    m = 1.0 / (1.0 + np.exp(-m))
    m = m.reshape(hp, wp, n)
    if n and crop:
        x1 = np.clip(np.minimum(boxes[:, 0], boxes[:, 2]) * wp - padding,
                     0, None)
        x2 = np.clip(np.maximum(boxes[:, 0], boxes[:, 2]) * wp + padding,
                     None, wp)
        y1 = np.clip(np.minimum(boxes[:, 1], boxes[:, 3]) * hp - padding,
                     0, None)
        y2 = np.clip(np.maximum(boxes[:, 1], boxes[:, 3]) * hp + padding,
                     None, hp)
        cols = np.arange(wp)[None, :, None]
        rows = np.arange(hp)[:, None, None]
        keep = ((cols >= x1) & (cols < x2) & (rows >= y1) & (rows < y2))
        m = m * keep
    return np.transpose(m, (2, 0, 1))                          # [n, hp, wp]


def traditional_nms(cfg: YolactConfig, boxes: np.ndarray, coeffs: np.ndarray,
                    scores: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """boxes [P,4] relative point form; coeffs [P,Md]; scores [C-1,P].
    Returns (boxes, coeffs, classes, scores) of the kept detections."""
    num_classes = scores.shape[0]
    boxes_px = boxes * cfg.max_size

    idx_lst, cls_lst, scr_lst = [], [], []
    for _cls in range(num_classes):
        cls_scores = scores[_cls]
        conf_mask = cls_scores > cfg.nms_conf_thresh
        idx = np.arange(len(cls_scores))[conf_mask]
        cls_scores = cls_scores[conf_mask]
        if len(cls_scores) == 0:
            continue
        preds = np.concatenate(
            [boxes_px[conf_mask], cls_scores[:, None]], axis=1
        ).astype(np.float32)
        keep = _greedy_nms(preds, cfg.nms_thresh)
        idx_lst.append(idx[keep])
        cls_lst.append(np.full(len(keep), _cls, np.int64))
        scr_lst.append(cls_scores[keep])

    if not idx_lst:
        e = np.zeros(0)
        return e.reshape(0, 4), e.reshape(0, coeffs.shape[1]), \
            e.astype(np.int64), e

    idx = np.concatenate(idx_lst)
    classes = np.concatenate(cls_lst)
    out_scores = np.concatenate(scr_lst)

    order = np.argsort(-out_scores, kind='stable')[:cfg.max_num_detections]
    idx = idx[order]
    return boxes[idx], coeffs[idx], classes[order], out_scores[order]


class TraditionalPipeline:
    """Drop-in Pipeline replacement for the host traditional-NMS path:
    jitted forward (forward_raw) on device, greedy per-class NMS + mask
    assembly on host.  Matches infer.Pipeline's InferenceOutput contract
    (lincomb: proto-res cropped sigmoid masks; direct: mask_size patches).
    """

    def __init__(self, cfg: YolactConfig, variables,
                 score_threshold: float = 0.0, preprocess: bool = False,
                 maskiou_variables=None, crop_masks: bool = True):
        import jax
        from functools import partial
        from yolact_tpu.config import MaskType
        from yolact_tpu.infer import forward_raw
        from yolact_tpu.models.yolact import Yolact
        self.cfg = cfg
        self.variables = variables
        self.score_threshold = score_threshold
        self.crop_masks = crop_masks
        self._raw_fn = jax.jit(partial(forward_raw, cfg, Yolact(cfg),
                                       preprocess=preprocess))
        # YOLACT++ maskiou rescoring runs in postprocess in the reference
        # (output_utils.py:79-88) and therefore applies to BOTH NMS
        # variants; only the lincomb branch rescores (the direct branch
        # returns before it, output_utils.py:101-120).  Variables are a
        # jit ARGUMENT (not a closure capture, which would bake the
        # weights into the executable as constants).
        self._maskiou_fn = None
        if (cfg.use_maskiou and maskiou_variables is not None
                and cfg.mask_type != MaskType.DIRECT
                and cfg.eval_mask_branch):
            from yolact_tpu.models.yolact import MaskIoUHead
            miou = MaskIoUHead(cfg)
            self._maskiou_vars = maskiou_variables
            self._maskiou_fn = jax.jit(lambda v, m: miou.apply(v, m))

    def __call__(self, imgs):
        from yolact_tpu.config import MaskType
        from yolact_tpu.infer import InferenceOutput
        cfg = self.cfg
        out = self._raw_fn(self.variables, images=imgs)
        boxes, scores, coeffs = (np.asarray(a) for a in out[:3])
        proto = np.asarray(out[3]) if out[3] is not None else None
        direct = cfg.mask_type == MaskType.DIRECT
        no_masks = proto is None and not direct  # --detect box-only mode
        B = boxes.shape[0]
        D = cfg.max_num_detections
        if no_masks:
            Hp = Wp = 1
        elif direct:
            Hp = Wp = cfg.mask_size
        else:
            Hp, Wp = proto.shape[1], proto.shape[2]
        ob = np.zeros((B, D, 4), np.float32)
        oc = np.zeros((B, D), np.int32)
        os_ = np.full((B, D), -1.0, np.float32)
        om = np.zeros((B, D, Hp, Wp), np.float32)
        ov = np.zeros((B, D), bool)
        for b in range(B):
            bb, cc, cls, sc = traditional_nms(
                cfg, boxes[b], coeffs[b], scores[b])
            n = min(len(sc), D)
            ob[b, :n] = bb[:n]
            oc[b, :n] = cls[:n]
            os_[b, :n] = sc[:n]
            ov[b, :n] = sc[:n] > self.score_threshold \
                if self.score_threshold > 0 else True
            if n and not no_masks:
                if direct:
                    # mask field rows are already sigmoid mask patches
                    om[b, :n] = cc[:n].reshape(n, Hp, Wp)
                else:
                    om[b, :n] = host_assemble_masks(proto[b], cc[:n],
                                                    bb[:n],
                                                    crop=self.crop_masks)
        mask_scores = None
        if self._maskiou_fn is not None:
            from yolact_tpu.detect.postprocess import select_class_maskiou
            iou_p = np.asarray(self._maskiou_fn(
                self._maskiou_vars, om.reshape(B * D, Hp, Wp, 1)))
            iou_p = iou_p.reshape(B, D, -1)            # [B, D, C-1]
            mask_scores = os_ * select_class_maskiou(iou_p, oc)
        return InferenceOutput(ob, oc, os_, om, ov, mask_scores)
