"""Host-side training / evaluation loop.

The TPU-native equivalent of the reference ``VFDepthTrainer``
(``trainer/vfdepth_trainer.py``): epoch/step loop with the same logging
cadence, periodic single-batch validation (cycled iterator — the reference's
``next(self.val_iter)`` StopIterations at exhaustion, SURVEY.md §2.1), per-
epoch checkpoints, and full evaluation with metric + median-scaled depth
metrics. Differences by design:
  * the compiled ``train_step`` contains fwd+bwd+Adam — no zero_grad/backward
    staging, no per-step barriers (collectives synchronize);
  * the LR schedule lives inside the optimizer (optax), stepped per-step;
  * data feeding is a prefetching host pipeline (``data/loader.py``).
"""
from __future__ import annotations

import itertools
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .model import VFDepthModel
from .step import TrainState, build_eval_step, build_train_step, create_train_state
from .checkpoint import load_checkpoint, save_checkpoint
from ..utils.logger import Logger
from ..utils.metrics import METRIC_NAMES, compute_depth_metrics


class Trainer:
    def __init__(self, cfg, model: VFDepthModel, use_tb: bool = True):
        from ..parallel.distributed import is_main_process
        self.cfg = cfg
        self.model = model
        self.num_epochs = cfg.num_epochs
        # process-0-only logging/checkpointing (reference rank-0 discipline);
        # compute paths below still run on every process — SPMD programs
        # must execute identically across hosts
        self.is_main = is_main_process()
        self.logger = Logger(cfg, use_tb and self.is_main)
        self.depth_metric_names = METRIC_NAMES
        self._shard_fn = None  # set by _build_step when a mesh is active

    # ------------------------------------------------------------------
    def learn(self, train_loader, val_loader=None, state: Optional[TrainState] = None,
              steps_per_epoch: Optional[int] = None, seed: int = 42,
              max_steps: Optional[int] = None):
        """Full training run. ``train_loader``/``val_loader`` yield numpy
        batch dicts (already collated, NHWC)."""
        rng = jax.random.PRNGKey(seed)
        first = None
        train_iter = iter(train_loader)
        first = next(train_iter)
        train_iter = itertools.chain([first], train_iter)

        spe = steps_per_epoch if steps_per_epoch is not None else getattr(
            train_loader, "steps_per_epoch", 0)
        # per-scene rig calibrations so the static warp windows are sized
        # over the dataset's calibration spread, not one batch's rig
        ds = getattr(train_loader, "dataset", None)
        rigs = (ds.rig_calibrations() if hasattr(ds, "rig_calibrations")
                else None)
        if state is None:
            state, tx = create_train_state(
                self.model, rng, jax.tree_util.tree_map(jnp.asarray, first),
                steps_per_epoch=spe, rigs=rigs)
        else:
            _, tx = create_train_state(
                self.model, rng, jax.tree_util.tree_map(jnp.asarray, first),
                steps_per_epoch=spe, rigs=rigs)

        if self.cfg.get("pretrain", False):
            state = load_checkpoint(self.cfg.load_weights_dir, state,
                                    self.cfg.models_to_load, load_optimizer=True)

        train_step = self._build_step(tx, first)
        eval_step = (build_eval_step(self.model, return_renders=True)
                     if val_loader is not None else None)
        # train-batch image panels at log checkpoints (reference logs the
        # full panel set from the *training* batch, utils/logger.py:138-170).
        # One extra forward per checkpoint; eval-mode BN (running stats).
        panel_step = build_eval_step(self.model, return_renders=True)
        val_iter = iter(val_loader) if val_loader is not None else None

        from ..data.loader import device_prefetch
        prefetch_depth = self.cfg.get("prefetch_depth", 2)

        step = int(state.step)
        start_time = time.time()
        # Running max of the warp-window overflow scalar across ALL steps
        # since the last log checkpoint, folded lazily on-device (one tiny
        # async `maximum` dispatch per step, no host sync). Overflow is an
        # expected event under fast egomotion in the 'actual' ST window
        # mode; sampling it only at checkpoint steps would let steps in
        # between silently truncate real warp content.
        overflow_acc = None
        for epoch in range(self.num_epochs):
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            epoch_iter = train_iter if epoch == 0 else iter(train_loader)
            # overlap host->device transfer with the device step
            epoch_iter = device_prefetch(epoch_iter, size=prefetch_depth,
                                         put_fn=self._shard_fn)
            for batch_idx, batch in enumerate(epoch_iter):
                before = time.time()
                state, logs = train_step(state, batch, rng)
                ov = logs.get("warp_window_overflow")
                if ov is not None:
                    overflow_acc = (ov if overflow_acc is None
                                    else jnp.maximum(overflow_acc, ov))

                if self.logger.is_checkpoint(step):
                    logs = {k: float(v) for k, v in logs.items()}
                    if overflow_acc is not None:
                        # max over every step since the last checkpoint, so
                        # intermittent truncation between checkpoints is
                        # observed and counts toward the dense-fallback strikes
                        logs["warp_window_overflow"] = float(overflow_acc)
                        overflow_acc = None
                    if self._note_warp_overflow(
                            logs.get("warp_window_overflow", 0.0)):
                        # persistent window truncation: recompile dense
                        train_step = self._build_step(tx, first)
                        panel_step = build_eval_step(self.model,
                                                     return_renders=True)
                        if val_loader is not None:
                            eval_step = build_eval_step(self.model,
                                                        return_renders=True)
                    if self.is_main:
                        self.logger.log_time(
                            epoch, batch_idx, time.time() - before,
                            logs.get("total_loss", float("nan")), start_time)
                        self.logger.log_scalars("train", logs, step)
                    # Train-batch panels require an extra forward. On a pod
                    # the train batch is sharded across processes, so a
                    # process-0-only forward would be a collective executed
                    # by one participant — a hang. Run it only single-process
                    # (process 0 there IS every process); multi-host runs
                    # keep the val panels, which use replicated batches.
                    if (self.logger.writers.get("train") is not None
                            and jax.process_count() == 1):
                        p_out, _ = panel_step(state, batch, rng)
                        self.logger.log_images(
                            "train", jax.tree_util.tree_map(np.asarray, batch),
                            {k: np.asarray(v) for k, v in p_out.items()
                             if hasattr(v, "shape")}, step)
                    if val_iter is not None:
                        val_iter = self._validate(eval_step, state, val_loader,
                                                  val_iter, rng, step)
                step += 1
                if max_steps is not None and step >= max_steps:
                    break

            # reference saves on rank 0 every `save_frequency` epochs
            # (trainer/vfdepth_trainer.py:46-47). Orbax is multi-host-aware
            # and performs a cross-process sync inside save: EVERY process
            # must call it (a process-0-only call deadlocks the pod); the
            # actual write happens from the primary host only.
            save_freq = max(int(self.cfg.get("save_frequency", 1) or 1), 1)
            if (epoch + 1) % save_freq == 0 or epoch == self.num_epochs - 1:
                save_checkpoint(self.cfg.save_weights_root, epoch, state)
            print("-" * 110)
            if max_steps is not None and step >= max_steps:
                break
        self.logger.close()
        return state

    def _note_warp_overflow(self, overflow: float) -> bool:
        """Track the runtime ``warp_window_overflow`` scalar across log
        checkpoints. One overflow gets a warning (the loss for the affected
        camera pairs truncated that step); two CONSECUTIVE checkpoints with
        overflow mean the static window size genuinely undersizes this
        data's rigs — disable windows on the model and return True so the
        caller recompiles the (dense, always-correct) warp path."""
        if overflow and overflow > 0:
            self._overflow_strikes = getattr(self, "_overflow_strikes", 0) + 1
            if self.is_main:
                print(f"WARNING: warp window overflow {overflow:.0f} px "
                      f"(strike {self._overflow_strikes}) — a static warp "
                      "window truncated real content this step")
            if self._overflow_strikes >= 2 and self.model.warp_window:
                if self.is_main:
                    print("WARNING: persistent warp-window overflow — "
                          "falling back to dense warps (recompiling)")
                self.model.warp_window = False
                self.model.warp_window_hw = None
                self._overflow_strikes = 0
                return True
        else:
            self._overflow_strikes = 0
        return False

    def _build_step(self, tx, example_batch):
        """Pick the step variant from ``tpu.*`` config and attached devices.

        ``cam_parallel_size`` > 1 requests the 2-D (data, cam) mesh — the
        camera axis sharded over that many devices, the rest data-parallel;
        plain multi-device hosts get the 1-D data mesh; a single device gets
        the unsharded step.
        """
        n_dev = jax.device_count()
        n_proc = jax.process_count()
        batch_size = int(self.cfg.batch_size)
        cam_par = int(self.cfg.get("cam_parallel_size", 1))
        if n_proc > 1 and cam_par <= 1:
            # Pod: loaders are per-host (cfg.batch_size = per-host batch), so
            # the single-host divisibility test below would see the wrong
            # denominator. A pod MUST take the sharded step — the unsharded
            # fallback would train per-process diverging copies.
            local_dev = jax.local_device_count()
            if batch_size % local_dev:
                raise ValueError(
                    f"multi-host: per-host batch {batch_size} must divide "
                    f"local device count {local_dev}")
            from .step import shard_train_step
            from ..parallel.mesh import shard_batch
            step_fn, mesh = shard_train_step(self.model, tx)
            self._shard_fn = lambda b: shard_batch(mesh, b)
            return step_fn
        if cam_par > 1 and n_dev >= cam_par:
            data_dim = n_dev // cam_par
            if batch_size % max(data_dim, 1) or self.model.num_cams % cam_par:
                raise ValueError(
                    f"cam_parallel_size={cam_par}: batch {batch_size} must "
                    f"divide over {data_dim} data shards and num_cams "
                    f"{self.model.num_cams} over {cam_par} camera shards")
            from .step import shard_train_step_2d
            from ..parallel.mesh import make_mesh_2d, shard_batch_2d
            mesh = make_mesh_2d(n_dev // cam_par, cam_par)
            self._shard_fn = lambda b: shard_batch_2d(
                mesh, self.model.num_cams, b)
            return shard_train_step_2d(
                self.model, tx, mesh,
                jax.tree_util.tree_map(jnp.asarray, example_batch))
        if n_dev > 1 and batch_size % n_dev == 0:
            from .step import shard_train_step
            from ..parallel.mesh import shard_batch
            step_fn, mesh = shard_train_step(self.model, tx)
            self._shard_fn = lambda b: shard_batch(mesh, b)
            return step_fn
        self._shard_fn = None
        return build_train_step(self.model, tx)

    def _validate(self, eval_step, state, val_loader, val_iter, rng, step):
        """Single-batch validation at log checkpoints; cycles the iterator."""
        try:
            batch = next(val_iter)
        except StopIteration:
            val_iter = iter(val_loader)
            batch = next(val_iter)
        jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
        outputs, logs = eval_step(state, jbatch, rng)
        if not self.is_main:
            return val_iter
        logs = {k: float(v) for k, v in logs.items()}
        if "depth" in batch:
            metric, median, med_scale = compute_depth_metrics(
                np.asarray(batch["depth"]), np.asarray(outputs["depth/0"]),
                np.asarray(batch["mask"]),
                self.cfg.eval_min_depth, self.cfg.eval_max_depth)
            print(f"          | median scale = {med_scale}")
            self.logger.print_perf(metric, "metric")
            self.logger.print_perf(median, "median")
        self.logger.log_scalars("val", logs, step)
        self.logger.log_images("val",
                               batch,
                               {k: np.asarray(v) for k, v in outputs.items()
                                if hasattr(v, "shape")},
                               step)
        return val_iter

    # ------------------------------------------------------------------
    def evaluate(self, eval_loader, state: TrainState, vis_results: bool = False,
                 load_weights: bool = True, seed: int = 42):
        """Full-dataset evaluation (reference ``evaluate``:112-152)."""
        rng = jax.random.PRNGKey(seed)
        if load_weights:
            state = load_checkpoint(self.cfg.load_weights_dir, state,
                                    self.cfg.models_to_load, load_optimizer=False)
        eval_step = build_eval_step(self.model)

        syn_visualize = bool(self.cfg.get("syn_visualize", False))
        syn_idx = self.cfg.get("syn_idx") or 0

        avg_metric = {k: 0.0 for k in METRIC_NAMES}
        avg_median = {k: 0.0 for k in METRIC_NAMES}
        n_batches = 0
        for batch_idx, batch in enumerate(eval_loader):
            # depth-synthesis visualization: skip ahead to syn_idx, render the
            # scripted sweep there, then stop (reference :129-143)
            if syn_visualize and batch_idx < syn_idx:
                continue
            jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
            outputs, _ = eval_step(state, jbatch, rng)
            if syn_visualize:
                from .synthesis import synthesize_sweep
                disp_vis = synthesize_sweep(
                    self.model, state.params, state.batch_stats, jbatch)
                out_np = {k: np.asarray(v) for k, v in outputs.items()}
                out_np["disp_vis"] = disp_vis
                self.logger.log_result(out_np, batch_idx, syn_visualize=True)
                break
            metric, median, _ = compute_depth_metrics(
                np.asarray(batch["depth"]), np.asarray(outputs["depth/0"]),
                np.asarray(batch["mask"]),
                self.cfg.eval_min_depth, self.cfg.eval_max_depth)
            for k in METRIC_NAMES:
                avg_metric[k] += metric[k]
                avg_median[k] += median[k]
            n_batches += 1
            if vis_results:
                self.logger.log_result(
                    {k: np.asarray(v) for k, v in outputs.items()}, batch_idx)

        for k in METRIC_NAMES:
            avg_metric[k] /= max(n_batches, 1)
            avg_median[k] /= max(n_batches, 1)
        print("Evaluation result...\n")
        self.logger.print_perf(avg_metric, "metric")
        self.logger.print_perf(avg_median, "median")
        return avg_metric, avg_median
