"""Multi-host (pod) SPMD wiring.

TPU-native replacement for the reference's multi-process rendezvous
(``utils/ddp.py:10-29``: env-var NCCL init at localhost:12355 + per-rank
seeds) and its ``DistributedSampler`` sharding
(``models/vfdepth.py:117-125``): one ``jax.distributed.initialize`` per
host process, loader index-space sharding by ``jax.process_index()``, and
process-0-only logging/checkpointing. On a single host every function here
degrades to a no-op/identity.

Initialization is driven by standard JAX env vars (set by the TPU pod
launcher) or the ``VFDEPTH_*`` overrides used by the localhost tests:

  VFDEPTH_COORDINATOR   host:port of process 0
  VFDEPTH_NUM_PROCESSES total process count
  VFDEPTH_PROCESS_ID    this process's id
"""
from __future__ import annotations

import os
from typing import Tuple

import jax


def maybe_initialize_distributed() -> Tuple[int, int]:
    """Initialize jax.distributed when launched as one process of many.

    Returns (process_index, process_count). Safe to call unconditionally:
    single-process launches (no coordinator configured) skip initialization.
    """
    coord = os.environ.get("VFDEPTH_COORDINATOR")
    nproc = os.environ.get("VFDEPTH_NUM_PROCESSES")
    pid = os.environ.get("VFDEPTH_PROCESS_ID")
    if coord and nproc:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid or 0),
        )
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # standard pod launch: jax reads cluster env vars itself
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    """True on the process that owns logging/checkpointing (reference's
    rank-0-only discipline, trainer/vfdepth_trainer.py:46-47,68-83)."""
    return jax.process_index() == 0


def loader_shard() -> Tuple[int, int]:
    """(shard_index, num_shards) for the data loader — the reference's
    DistributedSampler equivalent, driven by the process topology."""
    return jax.process_index(), jax.process_count()


def per_process_seed(seed: int) -> int:
    """Distinct host-side augmentation seed per process (reference seeds
    42 + rank, utils/ddp.py:23-27). Device PRNG keys stay identical across
    processes — SPMD programs must agree on them."""
    return seed + jax.process_index()
