"""Checkpoint save/load + resume.

Reference semantics (``yolact.py:473-490``, ``train.py:200-213,356-383``):
``weights/<config>_<epoch>_<iter>.pth`` naming, ``--resume
[path|interrupt|latest]``, Ctrl-C interrupt checkpoints, ``--keep_latest``
retention.  Improvements over the reference: optimizer state (momentum) is
saved too (the reference silently resets it on resume), and checkpoints are
a single msgpack blob of the whole train-state pytree.

``.pth`` files load transparently through the converter, so published
reference weights work as both eval weights and training init.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from yolact_tpu.config import YolactConfig
from yolact_tpu.utils.functions import SavePath


def _to_state_dict(state) -> Dict[str, Any]:
    # to_state_dict turns optax's tuple-of-namedtuples opt state into
    # nested dicts msgpack can serialize.
    out = {
        'step': np.asarray(state.step),
        'params': jax.tree.map(np.asarray, state.params),
        'batch_stats': jax.tree.map(np.asarray, state.batch_stats),
        'opt_state': serialization.to_state_dict(
            jax.tree.map(np.asarray, state.opt_state)),
    }
    if getattr(state, 'conf_state', None) is not None:
        out['conf_state'] = jax.tree.map(np.asarray, state.conf_state)
    return out


def save_checkpoint(state, path: str) -> None:
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    blob = serialization.msgpack_serialize(_to_state_dict(state))
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, state):
    """Restore a TrainState template from a .ckpt.  For ``.pth`` imports,
    load weights via :func:`load_weights` and graft them into a fresh state
    (the reference never saves optimizer state in .pth — cli/train.py does
    exactly that on --resume=<file>.pth)."""
    if path.endswith('.pth'):
        raise ValueError(
            '.pth files hold weights only; use load_weights(cfg, path) '
            'and state.replace(params=...) as cli/train.py does')
    with open(path, 'rb') as f:
        blob = serialization.msgpack_restore(f.read())
    target = _to_state_dict(state)
    # a template with conf_state (use_class_balanced_conf on) must accept
    # a checkpoint saved without it: the fresh-initialized counts stand in
    target.pop('conf_state', None)
    has_conf = 'conf_state' in blob
    conf_blob = blob.pop('conf_state', None)
    opt_blob = blob.pop('opt_state')
    target.pop('opt_state', None)
    restored = serialization.from_state_dict(target, blob)
    try:
        opt_state = serialization.from_state_dict(state.opt_state, opt_blob)
    except (ValueError, KeyError):
        # the optimizer chain changed shape between save and load (e.g.
        # the lr schedule moved out of optax): restore the elements that
        # still match (the momentum trace is what matters) and keep
        # fresh state for the rest
        elems = []
        for i, elem in enumerate(state.opt_state):
            sub = opt_blob.get(str(i)) if isinstance(opt_blob, dict) else None
            try:
                elems.append(serialization.from_state_dict(elem, sub))
            except Exception:
                elems.append(elem)
        opt_state = tuple(elems)
        print('(checkpoint optimizer state partially migrated: chain '
              'structure changed since the save)')
    state = state.replace(
        step=jax.numpy.asarray(restored['step']),
        params=restored['params'],
        batch_stats=restored['batch_stats'],
        opt_state=opt_state)
    if has_conf and getattr(state, 'conf_state', None) is not None:
        state = state.replace(conf_state=serialization.from_state_dict(
            jax.tree.map(np.asarray, state.conf_state), conf_blob))
    return state


def save_weights_only(variables: Dict, path: str) -> None:
    """Inference weights only ({'params', 'batch_stats'})."""
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    blob = serialization.msgpack_serialize(
        jax.tree.map(np.asarray, dict(variables)))
    with open(path, 'wb') as f:
        f.write(blob)


def load_weights(cfg: YolactConfig, path: str) -> Dict:
    """Load inference weights from .ckpt / .pth.

    Accepts both ``save_weights_only`` blobs ({'params', 'batch_stats'})
    and full ``save_checkpoint`` train states (what cli/train writes) —
    the latter is unwrapped so ``eval --trained_model=<trained>.ckpt``
    works directly, maskiou head included."""
    if path.endswith('.pth'):
        from yolact_tpu.convert.torch_import import load_reference_weights
        variables, unhandled = load_reference_weights(cfg, path)
        if unhandled:
            print(f'Warning: {len(unhandled)} unconverted keys: '
                  f'{unhandled[:5]}...')
        return variables
    with open(path, 'rb') as f:
        blob = serialization.msgpack_restore(f.read())
    if 'opt_state' in blob or 'step' in blob:  # train-state checkpoint
        variables = {'params': blob['params']['model'],
                     'batch_stats': blob.get('batch_stats', {})}
        if 'maskiou' in blob['params']:
            variables['maskiou'] = {'params': blob['params']['maskiou']}
        return variables
    return blob


def resolve_resume(resume: str, save_folder: str, config_name: str
                   ) -> Optional[str]:
    """'interrupt' | 'latest' | path (train.py:200-213)."""
    if resume == 'interrupt':
        return SavePath.get_interrupt(save_folder)
    if resume == 'latest':
        return SavePath.get_latest(save_folder, config_name)
    return resume


def iteration_from_path(path: str) -> int:
    return SavePath.from_str(path).iteration


def prune_previous_checkpoint(latest: Optional[str], iteration: int,
                              save_interval: int,
                              keep_latest_interval: int = 0) -> None:
    """--keep_latest retention (train.py:356-366): after the new save,
    delete ONLY the previously-latest checkpoint — never pre-existing
    files from other runs — unless it sits on a keep interval (the
    reference keeps it when ``iteration % keep_latest_interval ==
    save_interval``, i.e. the previous save fell on an interval
    multiple).  ``latest`` must be recorded BEFORE saving the new one."""
    if latest is None or not os.path.exists(latest):
        return
    if os.path.splitext(latest)[0].endswith('_interrupt'):
        # --resume=interrupt state is never auto-pruned (the reference's
        # retention only ever sees periodic saves)
        return
    if keep_latest_interval <= 0 or \
            iteration % keep_latest_interval != save_interval:
        os.unlink(latest)
