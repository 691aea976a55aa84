"""Checkpoint save/load (orbax) with the reference's layout semantics.

Reference behavior (``models/base_model.py:45-93``): per-epoch directories
``<save_weights_root>/weights_<epoch>/`` holding one file per network plus
the optimizer state; loading supports a ``models_to_load`` subset with
partial state-dict update and a graceful fallback when optimizer state is
missing. Here each epoch directory is one orbax checkpoint of the pytree
``{params: {depth_net, pose_net}, batch_stats: ..., opt_state: ..., step}``;
``models_to_load`` restores only the chosen nets' params/stats into the
current state (the partial-load capability used to eval depth_net only).
"""
from __future__ import annotations

import os
from typing import List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .step import TrainState


def save_checkpoint(save_root: str, epoch: int, state: TrainState) -> str:
    path = os.path.abspath(os.path.join(save_root, f"weights_{epoch}"))
    ckptr = ocp.StandardCheckpointer()
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def _restore_as_numpy(path: str):
    """Restore a checkpoint as host numpy arrays, ignoring saved shardings.

    A checkpoint written from a mesh-sharded run records its device topology;
    restoring it on a different one (train on a pod, eval on one chip) must
    not fail. Numpy leaves are topology-free and get placed on device when
    first used.
    """
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path)
    tree = getattr(meta, "item_metadata", None) or getattr(meta, "tree", meta)
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(path, restore_args=restore_args)


def load_checkpoint(load_dir: str, state: TrainState,
                    models_to_load: Optional[List[str]] = None,
                    load_optimizer: bool = True) -> TrainState:
    """Restore (a subset of) networks into ``state`` from ``load_dir``.

    Restores without a target template: the optimizer-state pytree structure
    can legitimately differ between save and load time (e.g. a training
    schedule vs a constant-LR eval optimizer), and ``models_to_load`` may
    name only a subset of networks.
    """
    path = os.path.abspath(load_dir)
    restored = _restore_as_numpy(path)

    if models_to_load is None:
        models_to_load = list(state.params.keys())

    params = dict(state.params)
    stats = dict(state.batch_stats)
    for name in models_to_load:
        new = restored["params"][name]
        cur = state.params.get(name)
        if cur is not None:
            cur_paths = {jax.tree_util.keystr(p) for p, _
                         in jax.tree_util.tree_flatten_with_path(cur)[0]}
            new_paths = {jax.tree_util.keystr(p) for p, _
                         in jax.tree_util.tree_flatten_with_path(new)[0]}
            if cur_paths != new_paths:
                missing = sorted(cur_paths - new_paths)[:4]
                extra = sorted(new_paths - cur_paths)[:4]
                print(f"WARNING: checkpoint param schema mismatch for "
                      f"'{name}' (model expects e.g. {missing}, checkpoint "
                      f"has e.g. {extra}). Known break: the pose VFNet "
                      "reduce_dim_0 moved from a single Conv to BEVFold "
                      "{kernel, kernel_rel, bias}; older pose checkpoints "
                      "need k2[...,z*(gc+1)+ci,o] split into kernel/"
                      "kernel_rel to restore.")
        params[name] = new
        stats[name] = restored["batch_stats"][name]

    opt_state = state.opt_state
    step = state.step
    if load_optimizer:
        # reshape the raw saved leaves into the live optimizer's pytree; a
        # structure mismatch (different schedule etc.) falls back to a fresh
        # optimizer, mirroring the reference's graceful adam-load fallback
        # (models/base_model.py:84-93)
        try:
            cur_leaves = jax.tree_util.tree_leaves(state.opt_state)
            new_leaves = jax.tree_util.tree_leaves(restored.get("opt_state"))
            if len(cur_leaves) == len(new_leaves):
                treedef = jax.tree_util.tree_structure(state.opt_state)
                opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
                if "step" in restored:
                    step = np.asarray(restored["step"])
            else:
                print("\tCannot load optimizer state (structure changed) - "
                      "the optimizer will be freshly initialized")
        except Exception:  # pragma: no cover - graceful fallback
            print("\tCannot load optimizer state - the optimizer will be "
                  "freshly initialized")
    return TrainState(step, params, stats, opt_state)
