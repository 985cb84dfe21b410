"""Device-mesh data parallelism.

The reference's multi-GPU story is single-process ``nn.DataParallel`` with a
custom scatter/gather (``train.py:149-170``).  The TPU-native equivalent is a
1-D ``jax.sharding.Mesh`` over all local chips: the batch dim of every input
is sharded across the ``'data'`` axis, parameters are replicated, and XLA
inserts the gradient all-reduce over ICI automatically when the jitted train
step computes a mean loss.  Multi-host extends the same mesh via
``jax.distributed.initialize`` (per-host data loading replaces the
reference's ``--batch_alloc`` heterogeneous-GPU knob, which has no TPU
equivalent).

YOLACT is ~50M params — far below the HBM of one chip — so data parallelism
is the default (SURVEY.md §2.8: no TP/PP/SP/EP in the reference).  On top of
it this module offers **spatial partitioning** (a second ``'space'`` mesh
axis sharding the image-height dim): XLA SPMD inserts the conv halo
exchanges over ICI automatically, so high-resolution variants (im700 and
beyond) can train with activations split across chips — a capability with
no reference equivalent.  Use ``make_mesh_2d`` + ``shard_batch_spatial``;
everything downstream of the jit is unchanged (SPMD is
semantics-preserving).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = 'data') -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Shard dim 0 (batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = 'data') -> Any:
    """Place a host batch pytree onto the mesh, batch-dim sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_mesh_2d(devices: Optional[Sequence[jax.Device]] = None,
                 data: Optional[int] = None,
                 space: int = 1) -> Mesh:
    """2-D ``('data', 'space')`` mesh: batch sharded over 'data', image
    height sharded over 'space' (conv halos handled by XLA SPMD)."""
    devices = list(devices) if devices is not None else jax.devices()
    if data is None:
        data = len(devices) // space
    if data * space != len(devices):
        raise ValueError(f'{data}x{space} mesh != {len(devices)} devices')
    return Mesh(np.array(devices).reshape(data, space), ('data', 'space'))


# Height-dim position per batch key for spatial partitioning: images are
# NHWC (H at dim 1); per-object masks — packed or not — are [B, G, H, ...]
# (H at dim 2).  Keyed by name, not by shape: a shape heuristic misfires
# when bit-packed mask widths collide with channel counts.
_SPATIAL_SPECS = {
    'image': (P('data', 'space'), 1),
    'gt_masks': (P('data', None, 'space'), 2),
    'gt_masks_packed': (P('data', None, 'space'), 2),
    # pre-downsampled proto/seg-res targets (data/coco.py:pad_batch
    # multires): tiny, keep batch-sharded only — their height is the
    # PROTO grid, not the image grid the 'space' axis splits
    'gt_masks_proto_packed': (P('data'), None),
    'gt_masks_seg_packed': (P('data'), None),
    'gt_masks_proto': (P('data'), None),
    'gt_masks_seg': (P('data'), None),
}


def shard_batch_spatial(mesh: Mesh, batch: Any) -> Any:
    """Place a train/eval batch on a 2-D mesh: every array's dim 0 (batch)
    over 'data'; the height dim of images and per-object masks over
    'space'.  Height must divide by the 'space' axis size.  ``batch`` is
    either the batch dict (specs keyed by name) or a bare [B,H,W,C] image
    array (sharded with the image spec)."""
    space = mesh.shape['space']

    def put(key, x):
        x = np.asarray(x) if not hasattr(x, 'ndim') else x
        spec, h_dim = _SPATIAL_SPECS.get(key, (P('data'), None))
        if h_dim is not None:
            h = x.shape[h_dim]
            if h % space:
                raise ValueError(f'{key} height {h} not divisible by '
                                 f'space={space}')
        return jax.device_put(x, NamedSharding(mesh, spec))

    if hasattr(batch, 'items'):
        return {k: put(k, v) for k, v in batch.items()}
    return put('image', batch)
