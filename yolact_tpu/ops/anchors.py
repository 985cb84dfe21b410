"""Static anchor (prior) generation.

The reference generates priors lazily per PredictionModule forward and caches
per device (``yolact.py:214-263``).  Shapes on TPU are static per config, so
we precompute the full ``[num_priors, 4]`` center-size prior tensor once on
host (numpy) — including the iteration order that "has to sync up with the
convout" (``yolact.py:223-224``) and the ``use_square_anchors`` bug-compat
flag — and close over it as a constant in the jitted program.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import List, Tuple

import numpy as np

from yolact_tpu.config import YolactConfig


def _conv_out(size: int, k: int, s: int, p: int, d: int = 1,
              ceil_mode: bool = False) -> int:
    eff = d * (k - 1) + 1
    num = size + 2 * p - eff
    if ceil_mode:
        return -(-num // s) + 1
    return num // s + 1


def _resnet_sizes(img: int, num_layers: int, atrous_layers=()) -> List[int]:
    """Feature sizes after each ResNet stage (backbone.py:60-139)."""
    s = _conv_out(img, 7, 2, 3)   # conv1
    s = _conv_out(s, 3, 2, 1)     # maxpool
    sizes = []
    for i in range(num_layers):
        stride = 1 if i == 0 else 2
        if i in atrous_layers:
            stride = 1
        if stride == 2:
            s = _conv_out(s, 3, 2, 1)
        sizes.append(s)
    # add_layer stages are stride-2 bottlenecks (backbone.py:156-158)
    return sizes


def _darknet_sizes(img: int, num_layers: int) -> List[int]:
    """Each darknet stage opens with a stride-2 3x3 conv (backbone.py:270-283)."""
    s = img  # _preconv is stride 1
    sizes = []
    for _ in range(num_layers):
        s = _conv_out(s, 3, 2, 1)
        sizes.append(s)
    return sizes


def _vgg_sizes(img: int, arch, extra_args, num_layers: int) -> List[int]:
    """VGG group sizes incl. special pool params + add_layer extras
    (backbone.py:324-444)."""
    s = img
    sizes = []
    for group in arch:
        for v in group:
            kw = {}
            if isinstance(v, tuple):
                kw = dict(v[1])
                v = v[0]
            if v == 'M':
                k = kw.get('kernel_size', 2)
                st = kw.get('stride', 2)
                p = kw.get('padding', 0)
                cm = kw.get('ceil_mode', False)
                s = _conv_out(s, k, st, p, ceil_mode=cm)
            else:
                # mirror models/vgg.py exactly: the k=3/p=1 default applies
                # only when the entry carries NO kwargs at all (the
                # reference's `args is None` branch, backbone.py:388-389);
                # any explicit kwargs fall back to torch Conv2d defaults
                if not kw:
                    kw = {'kernel_size': 3, 'padding': 1}
                k = kw.get('kernel_size', 3)
                st = kw.get('stride', 1)
                p = kw.get('padding', 0)
                d = kw.get('dilation', 1)
                s = _conv_out(s, k, st, p, d)
        sizes.append(s)
    extras = list(extra_args)
    while len(sizes) < num_layers and extras:
        _, downsample = extras.pop(0)
        pad = 1 if downsample > 1 else 0
        s = _conv_out(s, 1, 1, 0)
        s = _conv_out(s, 3, downsample, pad)
        sizes.append(s)
    return sizes


def _feature_sizes_1d(cfg: YolactConfig, img: int) -> list:
    bb = cfg.backbone
    n_backbone = max(bb.selected_layers) + 1

    if bb.type in ('resnet', 'resnet_gn'):
        atrous = bb.args[3] if len(bb.args) > 3 else ()
        sizes = _resnet_sizes(img, max(n_backbone, len(bb.args[0])), atrous)
        while len(sizes) < n_backbone:
            sizes.append(_conv_out(sizes[-1], 3, 2, 1))
    elif bb.type == 'darknet':
        sizes = _darknet_sizes(img, max(n_backbone, len(bb.args[0])))
        while len(sizes) < n_backbone:
            sizes.append(_conv_out(sizes[-1], 3, 2, 1))
    elif bb.type == 'vgg':
        arch, extra_args, _ = bb.args
        sizes = _vgg_sizes(img, arch, extra_args, n_backbone)
    else:
        raise ValueError(bb.type)

    selected = [sizes[i] for i in bb.selected_layers]
    if cfg.fpn is not None:
        for _ in range(cfg.fpn.num_downsample):
            if cfg.fpn.use_conv_downsample:
                selected.append(_conv_out(selected[-1], 3, 2, 1))
            else:
                # max_pool2d(1, stride=2)
                selected.append((selected[-1] - 1) // 2 + 1)
    return selected


def feature_map_sizes(cfg: YolactConfig, img_size=None
                      ) -> Tuple[Tuple[int, int], ...]:
    """(h, w) of each prediction feature map, in head order (P3..P7 when an
    FPN is present).  `img_size` may be an int (square, the normal path —
    augmentations resize to max_size x max_size) or an (h, w) tuple for
    preserve_aspect_ratio inputs."""
    img = img_size or cfg.max_size
    if isinstance(img, tuple):
        hs = _feature_sizes_1d(cfg, img[0])
        ws = _feature_sizes_1d(cfg, img[1])
        return tuple(zip(hs, ws))
    sizes = _feature_sizes_1d(cfg, img)
    return tuple((s, s) for s in sizes)


def _level_priors(conv_h: int, conv_w: int, aspect_ratios, scales,
                  cfg: YolactConfig) -> np.ndarray:
    """Priors for one feature level, matching yolact.py:224-246 exactly
    (iteration order: row-major pixels, then ars-group, scale, ar)."""
    bb = cfg.backbone
    out = []
    for j in range(conv_h):
        for i in range(conv_w):
            x = (i + 0.5) / conv_w
            y = (j + 0.5) / conv_h
            for ars in aspect_ratios:
                for scale in scales:
                    for ar in ars:
                        if not bb.preapply_sqrt:
                            ar = math.sqrt(ar)
                        if bb.use_pixel_scales:
                            w = scale * ar / cfg.max_size
                            h = scale / ar / cfg.max_size
                        else:
                            w = scale * ar / conv_w
                            h = scale / ar / conv_h
                        if bb.use_square_anchors:
                            h = w
                        out.append((x, y, w, h))
    return np.array(out, dtype=np.float32).reshape(-1, 4)


def _fast_level_priors(conv_h: int, conv_w: int, aspect_ratios, scales,
                       cfg: YolactConfig) -> np.ndarray:
    """Vectorised version of _level_priors (identical output)."""
    bb = cfg.backbone
    whs = []
    for ars in aspect_ratios:
        for scale in scales:
            for ar in ars:
                a = ar if bb.preapply_sqrt else math.sqrt(ar)
                if bb.use_pixel_scales:
                    w = scale * a / cfg.max_size
                    h = scale / a / cfg.max_size
                else:
                    w = scale * a / conv_w
                    h = scale / a / conv_h
                if bb.use_square_anchors:
                    h = w
                whs.append((w, h))
    whs = np.array(whs, dtype=np.float32)              # [k, 2]
    xs = (np.arange(conv_w, dtype=np.float32) + 0.5) / conv_w
    ys = (np.arange(conv_h, dtype=np.float32) + 0.5) / conv_h
    xy = np.stack(np.meshgrid(xs, ys), axis=-1)        # [h, w, 2] (x, y)
    xy = np.broadcast_to(xy[:, :, None, :], (conv_h, conv_w, len(whs), 2))
    wh = np.broadcast_to(whs[None, None, :, :], xy.shape)
    return np.concatenate([xy, wh], axis=-1).reshape(-1, 4).astype(np.float32)


@lru_cache(maxsize=32)
def _generate_priors_cached(cfg: YolactConfig, img_size) -> np.ndarray:
    sizes = feature_map_sizes(cfg, img_size)
    levels = []
    for idx, (h, w) in enumerate(sizes):
        levels.append(_fast_level_priors(
            h, w, cfg.backbone.pred_aspect_ratios[idx],
            cfg.backbone.pred_scales[idx], cfg))
    return np.concatenate(levels, axis=0)


def generate_priors(cfg: YolactConfig, img_size=None) -> np.ndarray:
    """All priors [num_priors, 4] in center-size form, cached per config.
    `img_size` is an int or (h, w) tuple."""
    return _generate_priors_cached(cfg, img_size or cfg.max_size)


def num_priors(cfg: YolactConfig, img_size=None) -> int:
    return generate_priors(cfg, img_size).shape[0]


def spec_out_hw(spec, h: int, w: int) -> Tuple[int, int]:
    """Static (h, w) through a make_net-style layer spec (the mini-language
    of models/layers.py:SpecNet / reference utils/functions.py:163-213)."""
    for entry in spec:
        num, k = entry[0], entry[1]
        kw = dict(entry[2]) if len(entry) > 2 else {}
        if isinstance(num, str):        # 'cat': parallel branches, channel
            h, w = spec_out_hw(k[0], h, w)  # concat — sizes must agree
            continue
        if k > 0:                       # conv
            s = kw.get('stride', 1)
            p = kw.get('padding', 0)
            d = kw.get('dilation', 1)
            h = _conv_out(h, k, s, p, d)
            w = _conv_out(w, k, s, p, d)
        elif num is None:               # bilinear upsample by -k
            h, w = h * -k, w * -k
        else:                           # deconv
            kk = -k
            s = kw.get('stride', 1)    # torch ConvTranspose2d default
            p = kw.get('padding', 0)
            h = (h - 1) * s - 2 * p + kk
            w = (w - 1) * s - 2 * p + kk
    return h, w


def proto_size(cfg: YolactConfig, img_size=None) -> Tuple[int, int]:
    """(h, w) of the protonet output — the gt-mask downsample target in
    lincomb_mask_loss (multibox_loss.py:515-523).  Verified against the
    real model by tests/test_anchors.py::test_proto_seg_size_match_model."""
    img = img_size or cfg.max_size
    if cfg.mask_proto_src is None:
        h, w = (img, img) if not isinstance(img, tuple) else img
    else:
        h, w = feature_map_sizes(cfg, img_size)[cfg.mask_proto_src]
    return spec_out_hw(cfg.mask_proto_net, h, w)


def seg_size(cfg: YolactConfig, img_size=None) -> Tuple[int, int]:
    """(h, w) of the semantic-seg aux head (1x1 conv on outs[0] —
    models/yolact.py), the gt downsample target of
    semantic_segmentation_loss (multibox_loss.py:225-228)."""
    return feature_map_sizes(cfg, img_size)[0]
