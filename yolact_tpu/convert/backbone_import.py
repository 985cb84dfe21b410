"""Backbone-only pretrained-weight import for all four backbone families.

Replaces the reference's per-backbone ``init_backbone`` remaps:
  * ResNet   (``backbone.py:141-154``):  torchvision ``layerN.`` keys
  * ResNet-GN (``backbone.py:168-214``): Detectron pickled blob dict
  * DarkNet  (``backbone.py:315-318``):  the repo's own darknet53.pth layout
  * VGG      (``backbone.py:415-426``):  torchvision ``features``-flat keys

plus :func:`init_weights` applying the focal-loss bias initialisation
(``yolact.py:529-545``) after loading.
"""

from __future__ import annotations

import math
import pickle
from typing import Any, Dict

import numpy as np

from yolact_tpu.config import YolactConfig
from yolact_tpu.convert.torch_import import convert_state_dict


def _prefix_backbone(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {f'backbone.{k}': v for k, v in sd.items()}


def resnet_backbone_sd(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torchvision resnet keys -> reference layout (layerN -> layers.N-1)."""
    out = {}
    for k, v in sd.items():
        if k.startswith('layer') and not k.startswith('layers'):
            idx = int(k[5])
            k = f'layers.{idx - 1}' + k[6:]
        if k.startswith('fc.'):
            continue
        out[k] = v
    return out


def vgg_backbone_sd(arch, sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torchvision-flat VGG keys ('0.weight', '2.weight', ...) ->
    'layers.g.l' layout, mirroring state_dict_lookup bookkeeping
    (backbone.py:343-346,369-380)."""
    lookup = {}
    total = 0
    for g, group in enumerate(arch):
        in_group = 0
        for v in group:
            if isinstance(v, tuple):
                v = v[0]
            if v == 'M':
                in_group += 1
            else:
                lookup[total + in_group] = (g, in_group)
                in_group += 2  # conv + relu
        total += in_group
    out = {}
    for k, v in sd.items():
        parts = k.split('.')
        if not parts[0].isdigit():
            continue
        flat = int(parts[0])
        if flat not in lookup:
            continue
        g, l = lookup[flat]
        out[f'layers.{g}.{l}.{parts[1]}'] = v
    return out


def gn_backbone_sd(num_layers, blob: Dict[str, np.ndarray]
                   ) -> Dict[str, np.ndarray]:
    """Detectron GN blob dict -> reference-style keys (backbone.py:168-214).

    Detectron names: conv1_w, conv1_gn_s/gn_b, res{2..5}_{i}_branch2{a,b,c}_w
    (+_gn_s/_gn_b), res{N}_{i}_branch1_w (+gn) for the projection shortcut.
    """
    out = {}
    out['conv1.weight'] = blob['conv1_w']
    out['bn1.weight'] = blob['conv1_gn_s']
    out['bn1.bias'] = blob['conv1_gn_b']
    branch = {'conv1': 'branch2a', 'conv2': 'branch2b', 'conv3': 'branch2c'}
    for si, blocks in enumerate(num_layers):
        res = f'res{si + 2}'
        for bi in range(blocks):
            for ours, theirs in branch.items():
                out[f'layers.{si}.{bi}.{ours}.weight'] = \
                    blob[f'{res}_{bi}_{theirs}_w']
                out[f'layers.{si}.{bi}.bn{ours[-1]}.weight'] = \
                    blob[f'{res}_{bi}_{theirs}_gn_s']
                out[f'layers.{si}.{bi}.bn{ours[-1]}.bias'] = \
                    blob[f'{res}_{bi}_{theirs}_gn_b']
            b1 = f'{res}_{bi}_branch1_w'
            if b1 in blob:
                out[f'layers.{si}.{bi}.downsample.0.weight'] = blob[b1]
                out[f'layers.{si}.{bi}.downsample.1.weight'] = \
                    blob[f'{res}_{bi}_branch1_gn_s']
                out[f'layers.{si}.{bi}.downsample.1.bias'] = \
                    blob[f'{res}_{bi}_branch1_gn_b']
    return out


def load_backbone_weights(cfg: YolactConfig, path: str):
    """Load a backbone pretraining checkpoint into converter variables."""
    bb = cfg.backbone
    if bb.type == 'resnet_gn':
        with open(path, 'rb') as f:
            blob = pickle.load(f, encoding='latin1')
        if 'blobs' in blob:
            blob = blob['blobs']
        sd = gn_backbone_sd(bb.args[0], blob)
    else:
        from yolact_tpu.convert.torch_import import load_pth
        sd = load_pth(path)
        if bb.type in ('resnet',):
            sd = resnet_backbone_sd(sd)
        elif bb.type == 'vgg':
            if any(k.split('.')[0].isdigit() for k in sd):
                sd = vgg_backbone_sd(bb.args[0], sd)
    variables, unhandled = convert_state_dict(cfg, _prefix_backbone(sd))
    if unhandled:
        raise ValueError(
            f'backbone checkpoint {path}: {len(unhandled)} unmapped '
            f'parameters, e.g. {sorted(unhandled)[:5]}')
    return variables


def merge_backbone(variables: Dict, backbone_vars: Dict) -> Dict:
    """Overlay converted backbone weights onto freshly-initialised model
    variables (the non-backbone params keep their xavier init).

    Raises if nothing merges — a silent no-op here means a fresh run
    "initialised from pretrained weights" actually trains from random
    init (the failure mode that once shipped when this was handed a
    (variables, unhandled) tuple instead of the variables dict)."""
    if not hasattr(backbone_vars, 'items'):
        raise TypeError(
            f'merge_backbone expects a variables dict, got '
            f'{type(backbone_vars).__name__}')
    merged = 0

    def merge(dst, src):
        nonlocal merged
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = v
                merged += 1
    out = jax_tree_to_mutable(variables)
    for coll in ('params', 'batch_stats'):
        if coll in backbone_vars and backbone_vars[coll]:
            merge(out.setdefault(coll, {}), backbone_vars[coll])
    if merged == 0:
        raise ValueError('merge_backbone merged zero parameters')
    return out


def jax_tree_to_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, 'items'):
        return {k: jax_tree_to_mutable(v) for k, v in tree.items()}
    return tree


def focal_bias_init(cfg: YolactConfig, variables: Dict) -> Dict:
    """conf_layer bias init for focal loss (yolact.py:529-545)."""
    if not cfg.use_focal_loss:
        return variables
    out = jax_tree_to_mutable(variables)
    params = out['params']
    for name, head in params.items():
        if not name.startswith('prediction_layers'):
            continue
        conf = head.get('conf_layer', {}).get('conv')
        if conf is None or 'bias' not in conf:
            continue
        bias = np.array(conf['bias'])
        pi = cfg.focal_loss_init_pi
        # exact reference quirk: only element 0 is treated as "background";
        # the rest of the whole (num_priors*num_classes) bias vector gets
        # the foreground value (yolact.py:540-546)
        if not cfg.use_sigmoid_focal_loss:
            bias[0] = np.log((1 - pi) / pi)
            bias[1:] = -np.log(len(bias) - 1)
        else:
            bias[0] = -np.log(pi / (1 - pi))
            bias[1:] = -np.log((1 - pi) / pi)
        conf['bias'] = bias
    return out
