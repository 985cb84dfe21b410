"""Import published PyTorch YOLACT checkpoints into the flax param tree.

The reference saves raw ``state_dict``s (``yolact.py:473-475``); its load path
applies backwards-compat key surgery (``yolact.py:477-490``).  This module
maps every torch key to the corresponding flax path and reshapes weights:

  * conv   weight  OIHW -> HWIO
  * deconv weight  IOHW -> HWOI (flax ConvTranspose with transpose_kernel)
  * linear weight  OI   -> IO
  * BatchNorm weight/bias -> scale/bias; running stats -> batch_stats

Backbone-only pretraining checkpoints (``resnet50-19c8e357.pth`` style keys
``layer1.0...``) are also supported, mirroring ``init_backbone``'s
``layerN -> layers.N-1`` remap (``backbone.py:141-154``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _conv_w(v):
    return np.transpose(v, (2, 3, 1, 0))    # OIHW -> HWIO


def _deconv_w(v):
    return np.transpose(v, (2, 3, 1, 0))    # IOHW -> HW O I (transpose_kernel)


Path = Tuple[str, ...]


def _set(tree: Dict, path: Path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _bn_map(coll_params, coll_stats, prefix: Path, torch_prefix: str,
            sd: Dict[str, np.ndarray], norm: str = 'bn'):
    sub = norm
    if f'{torch_prefix}.weight' in sd:
        _set(coll_params, prefix + (sub, 'scale'), sd[f'{torch_prefix}.weight'])
        _set(coll_params, prefix + (sub, 'bias'), sd[f'{torch_prefix}.bias'])
    if f'{torch_prefix}.running_mean' in sd:
        _set(coll_stats, prefix + (sub, 'mean'), sd[f'{torch_prefix}.running_mean'])
        _set(coll_stats, prefix + (sub, 'var'), sd[f'{torch_prefix}.running_var'])


def _conv_map(params, prefix: Path, torch_prefix: str, sd, deconv=False):
    w = sd[f'{torch_prefix}.weight']
    _set(params, prefix + ('conv', 'kernel'),
         _deconv_w(w) if deconv else _conv_w(w))
    if f'{torch_prefix}.bias' in sd:
        _set(params, prefix + ('conv', 'bias'), sd[f'{torch_prefix}.bias'])


def _map_specnet(take, params, flax_prefix: Path, torch_prefix: str,
                 spec, sd):
    """Map a make_net Sequential's weights onto SpecNet's ``layers_{i}``
    naming, recursing into 'cat' sub-networks (reference Concat keeps
    them under ``.{i}.nets.{j}``, yolact.py:34-43)."""
    i = 0
    for entry in spec:
        num, k = entry[0], entry[1]
        if isinstance(num, str):            # 'cat'
            for j, sub in enumerate(k):
                _map_specnet(take, params,
                             flax_prefix + (f'layers_{i}_cat_{j}',),
                             f'{torch_prefix}.{i}.nets.{j}', sub, sd)
        elif num is not None:               # conv (k>0) or deconv (k<0)
            if f'{torch_prefix}.{i}.weight' in sd:
                take(f'{torch_prefix}.{i}', _conv_map, params,
                     flax_prefix + (f'layers_{i}',),
                     f'{torch_prefix}.{i}', sd, deconv=k < 0)
        i += 2  # skip the ReLU slot


def convert_state_dict(cfg, sd: Dict[str, np.ndarray]):
    """Convert a full-model torch state dict to {'params':..., 'batch_stats':...}.

    cfg: YolactConfig describing the architecture the checkpoint belongs to.
    """
    sd = dict(sd)
    # yolact.py:481-489 compat surgery
    for key in list(sd):
        if key.startswith('backbone.layer') and not key.startswith('backbone.layers'):
            del sd[key]
        elif key.startswith('fpn.downsample_layers.'):
            if cfg.fpn is not None and \
                    int(key.split('.')[2]) >= cfg.fpn.num_downsample:
                del sd[key]

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    handled = set()

    def take(torch_prefix, fn, *a, **kw):
        fn(*a, **kw)
        for k in list(sd):
            if k.startswith(torch_prefix + '.'):
                handled.add(k)

    # ---- backbone ----
    bb = cfg.backbone
    bpfx = 'backbone'
    bkeys = [k for k in sd if k.startswith('backbone.')]
    if bb.type in ('resnet', 'resnet_gn'):
        norm = 'gn' if bb.type == 'resnet_gn' else 'bn'
        take('backbone.conv1', _conv_map, params, ('backbone', 'conv1'),
             'backbone.conv1', sd)
        take('backbone.bn1', _bn_map, params, stats, ('backbone', 'bn1'),
             'backbone.bn1', sd, norm)
        pat = re.compile(r'backbone\.layers\.(\d+)\.(\d+)\.(.*)')
        seen = set()
        for k in bkeys:
            m = pat.match(k)
            if not m:
                continue
            si, bi = int(m.group(1)), int(m.group(2))
            if (si, bi) in seen:
                continue
            seen.add((si, bi))
            tp = f'backbone.layers.{si}.{bi}'
            fp = ('backbone', f'layers_{si}_{bi}')
            for n in (1, 2, 3):
                cp = f'{tp}.conv{n}'
                if f'{cp}.weight' in sd:
                    if f'{cp}.conv_offset_mask.weight' in sd:  # DCN block
                        _set(params, fp + (f'conv{n}', 'weight'),
                             _conv_w(sd[f'{cp}.weight']))
                        _set(params, fp + (f'conv{n}', 'bias'), sd[f'{cp}.bias'])
                        take(f'{cp}.conv_offset_mask', _conv_map, params,
                             fp + (f'conv{n}', 'conv_offset_mask'),
                             f'{cp}.conv_offset_mask', sd)
                        handled.update({f'{cp}.weight', f'{cp}.bias'})
                    else:
                        take(cp, _conv_map, params, fp + (f'conv{n}',), cp, sd)
                take(f'{tp}.bn{n}', _bn_map, params, stats, fp + (f'bn{n}',),
                     f'{tp}.bn{n}', sd, norm)
            if f'{tp}.downsample.0.weight' in sd:
                take(f'{tp}.downsample.0', _conv_map, params,
                     fp + ('downsample_conv',), f'{tp}.downsample.0', sd)
                take(f'{tp}.downsample.1', _bn_map, params, stats,
                     fp + ('downsample_bn',), f'{tp}.downsample.1', sd, norm)
    elif bb.type == 'darknet':
        take('backbone._preconv.0', _conv_map, params,
             ('backbone', 'preconv', 'conv'), 'backbone._preconv.0', sd)
        take('backbone._preconv.1', _bn_map, params, stats,
             ('backbone', 'preconv', 'bn'), 'backbone._preconv.1', sd)
        pat = re.compile(r'backbone\.layers\.(\d+)\.(\d+)\.(.*)')
        seen = set()
        for k in bkeys:
            m = pat.match(k)
            if not m:
                continue
            si, bi = int(m.group(1)), int(m.group(2))
            if (si, bi) in seen:
                continue
            seen.add((si, bi))
            tp = f'backbone.layers.{si}.{bi}'
            fp = ('backbone', f'layers_{si}_{bi}')
            if bi == 0:  # stage-opening DarkConv (Sequential conv,bn,leaky)
                take(f'{tp}.0', _conv_map, params, fp + ('conv',), f'{tp}.0', sd)
                take(f'{tp}.1', _bn_map, params, stats, fp + ('bn',),
                     f'{tp}.1', sd)
            else:        # DarkBlock with conv1/conv2 DarkConvs
                for cn in ('conv1', 'conv2'):
                    take(f'{tp}.{cn}.0', _conv_map, params,
                         fp + (cn, 'conv'), f'{tp}.{cn}.0', sd)
                    take(f'{tp}.{cn}.1', _bn_map, params, stats,
                         fp + (cn, 'bn'), f'{tp}.{cn}.1', sd)
    elif bb.type == 'vgg':
        pat = re.compile(r'backbone\.layers\.(\d+)\.(\d+)\.(weight|bias)')
        for k in bkeys:
            m = pat.match(k)
            if m and m.group(3) == 'weight':
                gi, li = int(m.group(1)), int(m.group(2))
                take(f'backbone.layers.{gi}.{li}', _conv_map, params,
                     ('backbone', f'layers_{gi}_{li}'),
                     f'backbone.layers.{gi}.{li}', sd)
        npat = re.compile(r'backbone\.norms\.(\d+)\.weight')
        for k in bkeys:
            m = npat.match(k)
            if m:
                ni = int(m.group(1))
                take(f'backbone.norms.{ni}', _bn_map, params, stats,
                     ('backbone', f'norms_{ni}'), f'backbone.norms.{ni}', sd)

    # ---- FPN ----
    if cfg.fpn is not None:
        for kind in ('lat_layers', 'pred_layers', 'downsample_layers'):
            pat = re.compile(rf'fpn\.{kind}\.(\d+)\.weight')
            for k in list(sd):
                m = pat.match(k)
                if m:
                    i = int(m.group(1))
                    take(f'fpn.{kind}.{i}', _conv_map, params,
                         ('fpn', f'{kind}_{i}'), f'fpn.{kind}.{i}', sd)

    # ---- protonet ----
    if any(k.startswith('proto_net.') for k in sd):
        _map_specnet(take, params, ('proto', 'proto_net'), 'proto_net',
                     cfg.mask_proto_net, sd)

    # ---- prediction heads ----
    head_pat = re.compile(r'prediction_layers\.(\d+)\.(.*?)\.(\d+\.)?(weight|bias)')
    head_indices = sorted({int(m.group(1)) for k in sd
                           if (m := head_pat.match(k))})
    for hi in head_indices:
        hp = f'prediction_layers.{hi}'
        fp = (f'prediction_layers_{hi}',)
        if cfg.extra_head_net is not None:
            _map_specnet(take, params, fp + ('upfeature',),
                         f'{hp}.upfeature', cfg.extra_head_net, sd)
        for layer in ('bbox_layer', 'conf_layer', 'mask_layer', 'score_layer',
                      'inst_layer', 'gate_layer'):
            if f'{hp}.{layer}.weight' in sd:
                take(f'{hp}.{layer}', _conv_map, params, fp + (layer,),
                     f'{hp}.{layer}', sd)
        for branch in ('bbox', 'conf', 'mask'):
            for k in list(sd):
                m = re.match(rf'{hp}\.{branch}_extra\.(\d+)\.weight', k)
                if m:
                    i = int(m.group(1))
                    take(f'{hp}.{branch}_extra.{i}', _conv_map, params,
                         fp + (f'{branch}_extra_{i}',),
                         f'{hp}.{branch}_extra.{i}', sd)

    # ---- aux heads ----
    if 'semantic_seg_conv.weight' in sd:
        take('semantic_seg_conv', _conv_map, params, ('semantic_seg_conv',),
             'semantic_seg_conv', sd)
    if 'class_existence_fc.weight' in sd:
        _set(params, ('class_existence_fc', 'kernel'),
             np.transpose(sd['class_existence_fc.weight'], (1, 0)))
        _set(params, ('class_existence_fc', 'bias'),
             sd['class_existence_fc.bias'])
        handled.update({'class_existence_fc.weight', 'class_existence_fc.bias'})
    # maskiou net (separate MaskIoUHead module tree)
    miou_params: Dict[str, Any] = {}
    for k in list(sd):
        m = re.match(r'maskiou_net\.maskiou_net\.(\d+)\.weight', k)
        if m:
            i = int(m.group(1))
            take(f'maskiou_net.maskiou_net.{i}', _conv_map, miou_params,
                 ('maskiou', 'maskiou_net', f'layers_{i}'),
                 f'maskiou_net.maskiou_net.{i}', sd)

    unhandled = [k for k in sd if k not in handled
                 and not k.endswith('num_batches_tracked')]
    out = {'params': params, 'batch_stats': stats}
    if miou_params:
        out['maskiou'] = {'params': miou_params}
    return out, unhandled


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state dict to numpy (torch CPU only used for IO)."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(sd, dict) and 'state_dict' in sd:
        sd = sd['state_dict']
    return {k: v.detach().numpy() if hasattr(v, 'detach') else np.asarray(v)
            for k, v in sd.items()}


def load_reference_weights(cfg, path: str):
    """Full pipeline: .pth file -> flax variables for Yolact(cfg)."""
    variables, unhandled = convert_state_dict(cfg, load_pth(path))
    return variables, unhandled
