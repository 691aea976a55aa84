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
    """Device-put every array in a batch pytree with its leading axis sharded.

    Multi-host: each process passes its LOCAL loader shard (leading axis =
    local batch) and the leaves are assembled into global arrays over the
    process-spanning mesh — the DistributedSampler-equivalent glue
    (reference models/vfdepth.py:117-125)."""
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        def put(x):
            global_shape = (x.shape[0] * jax.process_count(),) + tuple(x.shape[1:])
            return jax.make_array_from_process_local_data(sh, np.asarray(x),
                                                          global_shape)
        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


# ---------------------------------------------------------------------------
# 2-D (data, cam) mesh: camera-axis model parallelism
# ---------------------------------------------------------------------------
# The reference's only strategy is DDP (SURVEY.md §2.8), but its natural TPU
# model axis is the camera dimension: every per-camera stage (encoder, voxel
# back-projection, frustum sampling, view warping) is independent until the
# cross-camera fusion sum in VFNet. Sharding batch arrays as
# [data, cam, ...] lets GSPMD partition the per-camera compute and insert the
# psum over the 'cam' axis exactly at those fusion sums — the tensor-parallel
# analog for this architecture, riding ICI.

CAM_AXIS = "cam"


def make_mesh_2d(data: int, cam: int,
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """(data, cam) mesh over the first data*cam devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: data * cam]).reshape(data, cam)
    return Mesh(devices, (DATA_AXIS, CAM_AXIS))


def batch_sharding_2d(mesh: Mesh, num_cams: int, batch: Any) -> Any:
    """Per-leaf shardings: [b, cams, ...] arrays shard (data, cam); other
    arrays shard batch only. Returns a pytree of NamedShardings matching
    ``batch``'s structure (usable as a jit in_sharding or device_put target).
    """
    dc = NamedSharding(mesh, P(DATA_AXIS, CAM_AXIS))
    d = NamedSharding(mesh, P(DATA_AXIS))

    def pick(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[1] == num_cams:
            return dc
        return d

    return jax.tree_util.tree_map(pick, batch)


def shard_batch_2d(mesh: Mesh, num_cams: int, batch: Any) -> Any:
    shardings = batch_sharding_2d(mesh, num_cams, batch)
    if jax.process_count() > 1:
        # Pod: each process holds its local [b_local, cams, ...] chunk; the
        # data axis spans hosts (make_mesh_2d lays devices process-major →
        # rows = hosts), the cam axis stays within a host.
        def put(x, sh):
            global_shape = (x.shape[0] * jax.process_count(),) + tuple(x.shape[1:])
            return jax.make_array_from_process_local_data(sh, np.asarray(x),
                                                          global_shape)
        return jax.tree_util.tree_map(put, batch, shardings)
    return jax.tree_util.tree_map(jax.device_put, batch, shardings)
