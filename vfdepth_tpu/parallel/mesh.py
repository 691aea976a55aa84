"""Device mesh + sharding helpers (SPMD data parallelism over ICI).

TPU-native replacement for the reference's NCCL DDP stack
(``utils/ddp.py``, ``models/vfdepth.py:62-70``, reference SURVEY.md §2.8):
a 1-D ``data`` mesh, batch sharded on axis 0, parameters replicated. Under
``jax.jit`` with these shardings XLA inserts the gradient psum over ICI
automatically, batch-norm statistics become globally synchronized for free
(mean over a sharded batch axis is global semantics — the SyncBatchNorm
equivalent), and no explicit barriers are needed (collectives synchronize).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard a [B, ...] array's leading axis across the data mesh axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = DATA_AXIS) -> Any:
    """Device-put every array in a batch pytree with its leading axis sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
