"""Compiled training / validation steps (optax + jit + GSPMD sharding).

One ``train_step(state, batch, rng) -> (state, logs)`` containing the full
pipeline — pose+depth forward, view rendering, loss, backward, Adam update —
compiled as a single XLA program. This replaces the reference's eager
``zero_grad -> process_batch -> backward -> step`` loop
(``trainer/vfdepth_trainer.py:63-66``) and its per-step ``dist.barrier``.

Optimizer parity (reference ``models/vfdepth.py:175-189``): one Adam over all
networks' params, lr ``learning_rate``; StepLR(``scheduler_step_size`` epochs,
gamma 0.1) expressed as an optax piecewise-constant schedule over steps.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from .model import VFDepthModel
from ..parallel.mesh import (batch_sharding, batch_sharding_2d, make_mesh,
                             replicated)


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(learning_rate: float, scheduler_step_size: int,
                     steps_per_epoch: int, gamma: float = 0.1):
    """StepLR(step_size epochs, gamma) as an optax schedule over global steps."""
    if steps_per_epoch <= 0:
        return learning_rate
    boundary = scheduler_step_size * steps_per_epoch
    return optax.piecewise_constant_schedule(
        learning_rate, {boundary: gamma})


def make_optimizer(learning_rate, scheduler_step_size: int,
                   steps_per_epoch: int, pose_boost: float = 1.0,
                   boost_fade_start: int = 0, boost_fade_steps: int = 1
                   ) -> optax.GradientTransformation:
    """Adam(+StepLR), optionally with a cold-start pose-net LR boost.

    Under Adam the per-step parameter motion is ~lr regardless of gradient
    scale, so a from-scratch pose head's translation magnitude grows at
    most ~lr per step — at 1.5 m/frame ego-motion reaching the
    photometrically consistent |t| needs ~|t|/lr steps (measured: |t| grew
    2.3e-4/step at lr 2e-4, docs/PERF.md round-5 log). The boost multiplies
    the POSE NET's updates by ``pose_boost`` while the cold-start schedule
    is active, fading linearly to exactly 1.0 over
    [boost_fade_start, boost_fade_start + boost_fade_steps] (aligned with
    the spatio-temporal ramp), after which the optimizer is the reference
    Adam exactly. Gradient-scale tricks cannot do this — Adam normalizes
    them away; only an update-scale group can."""
    sched = make_lr_schedule(learning_rate, scheduler_step_size, steps_per_epoch)
    base = optax.adam(sched)
    if pose_boost <= 1.0:
        return base

    def factor(count):
        f = jnp.clip((count - boost_fade_start)
                     / max(boost_fade_steps, 1), 0.0, 1.0)
        return pose_boost + (1.0 - pose_boost) * f

    def pose_mask(params):
        return {k: jax.tree_util.tree_map(lambda _: k == "pose_net", v)
                for k, v in params.items()}

    return optax.chain(
        base, optax.masked(optax.scale_by_schedule(factor), pose_mask))


def create_train_state(model: VFDepthModel, rng: jax.Array, batch,
                       steps_per_epoch: int = 0,
                       rigs=None) -> Tuple[TrainState, optax.GradientTransformation]:
    # size the static warp windows from this batch's rig calibration plus
    # any dataset-provided per-scene rigs (host-side, before any step
    # compiles — DDAD calibration varies per scene)
    model.configure_warp_window(batch, rigs=rigs)
    params, batch_stats = model.init(rng, batch)
    cfg = model.cfg
    warm = int(cfg.get("cold_start_warmup_steps", 0))
    ramp = int(cfg.get("cold_start_ramp_steps", 0))
    boost = (float(cfg.get("cold_start_pose_lr_boost", 1.0))
             if (warm or ramp) else 1.0)
    # the boost fades with the LAST loss ramp: the joint ramp
    # [warm, warm+ramp] by default, the staggered ST ramp
    # [warm+ramp, warm+2*ramp] under cold_start_stagger_ramps
    stagger = bool(cfg.get("cold_start_stagger_ramps", False))
    tx = make_optimizer(cfg.learning_rate, cfg.scheduler_step_size,
                        steps_per_epoch, pose_boost=boost,
                        boost_fade_start=(warm + ramp) if stagger else warm,
                        boost_fade_steps=max(ramp, 1))
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, batch_stats, opt_state), tx


def build_train_step(model: VFDepthModel, tx: optax.GradientTransformation,
                     donate: bool = True):
    """Returns jitted train_step(state, batch, rng) -> (state, logs)."""

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            outputs, (loss, logs), new_stats = model.forward(
                params, state.batch_stats, batch, rng, train=True,
                step=state.step)
            return loss, (logs, new_stats)

        grads, (logs, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        scalar_logs = {k: v for k, v in logs.items()
                       if hasattr(v, "ndim") and v.ndim == 0}
        new_state = TrainState(state.step + 1, new_params, new_stats, new_opt)
        return new_state, scalar_logs

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def build_eval_step(model: VFDepthModel, return_renders: bool = False):
    """Returns jitted eval_step(state, batch, rng) -> (outputs, logs)."""

    def eval_step(state: TrainState, batch, rng):
        outputs, (loss, logs), _ = model.forward(
            state.params, state.batch_stats, batch, rng, train=False,
            return_renders=return_renders)
        return outputs, {k: v for k, v in logs.items()
                         if hasattr(v, "ndim") and v.ndim == 0}

    return jax.jit(eval_step)


def shard_train_step(model: VFDepthModel, tx, mesh=None):
    """jit the train step with explicit GSPMD shardings over a data mesh.

    Batch arrays shard on their leading axis; state is replicated. XLA
    inserts the gradient all-reduce over ICI (the DDP equivalent).
    """
    if mesh is None:
        mesh = make_mesh()
    repl = replicated(mesh)
    bsh = batch_sharding(mesh)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            outputs, (loss, logs), new_stats = model.forward(
                params, state.batch_stats, batch, rng, train=True,
                step=state.step)
            return loss, (logs, new_stats)

        grads, (logs, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        scalar_logs = {k: v for k, v in logs.items()
                       if hasattr(v, "ndim") and v.ndim == 0}
        return TrainState(state.step + 1, new_params, new_stats, new_opt), scalar_logs

    return jax.jit(
        train_step,
        in_shardings=(repl, bsh, repl),
        out_shardings=(repl, repl),
    ), mesh


def shard_train_step_2d(model: VFDepthModel, tx, mesh, example_batch):
    """jit the train step over a 2-D (data, cam) mesh.

    Batch arrays with a camera dimension shard as [data, cam, ...]; GSPMD
    partitions every per-camera stage (encoders, back-projection, warps) over
    the 'cam' axis and inserts the cross-camera psum at VFNet's fusion sums —
    camera-axis model parallelism on top of data parallelism. Params/state
    stay replicated.
    """
    repl = replicated(mesh)
    bsh = batch_sharding_2d(mesh, model.num_cams, example_batch)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            outputs, (loss, logs), new_stats = model.forward(
                params, state.batch_stats, batch, rng, train=True,
                step=state.step)
            return loss, (logs, new_stats)

        grads, (logs, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        scalar_logs = {k: v for k, v in logs.items()
                       if hasattr(v, "ndim") and v.ndim == 0}
        return TrainState(state.step + 1, new_params, new_stats, new_opt), scalar_logs

    return jax.jit(
        train_step,
        in_shardings=(repl, bsh, repl),
        out_shardings=(repl, repl),
    )
