"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data parallelism over NCCL
(SURVEY §2.4; reference apis/mmdet_train.py:71-85). The TPU-native equivalent:
a 1-D ``data`` mesh axis, batch arrays sharded on axis 0, parameters
replicated; XLA inserts the gradient psum over ICI during ``jit`` of the
train step. No hand-written collectives needed for DP — and the mesh is
N-D-ready (``data`` x ``model``) for later tensor-sharded variants.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ('data',)) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def make_local_mesh(axis_names: Sequence[str] = ('data',)) -> Mesh:
    """Mesh over THIS process's addressable devices only — for per-host
    computations (e.g. rank-0 eval during multi-host training) that must not
    involve cross-process collectives."""
    devices = jax.local_devices()
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P('data'))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in the batch pytree with its bs axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
