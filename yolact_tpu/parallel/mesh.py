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
is the whole story (SURVEY.md §2.8: no TP/PP/SP/EP in the reference); the
mesh abstraction here still lets a larger variant add axes later.
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
