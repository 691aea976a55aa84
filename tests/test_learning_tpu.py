"""Depth-learning regression on real hardware (auto-skipped off-TPU).

The CI-shaped version of scripts/tpu_learn_probe.py: with the analytic
GT pose, photometric training on the synthetic ground-plane scene must
drive Abs.Rel down — the strongest end-to-end correctness signal without
the real datasets. (The full-scale probe measured 0.678 -> 0.073 over 500
steps at 192x320; this trims shapes/steps for CI. Joint training from a
RANDOM init converges under the staged cold-start recipe — probe
Abs.Rel 0.146/a1 0.877 at 2400 steps — and collapses without it. See
docs/PERF.md "Learning validation".)
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="learning regression runs on TPU hardware only")


@pytest.mark.slow
def test_gt_pose_training_improves_depth():
    from vfdepth_tpu.presets import build_config
    from vfdepth_tpu.data.synthetic_scene import SyntheticSceneDataset
    from vfdepth_tpu.training.model import VFDepthModel
    from vfdepth_tpu.training.step import (build_eval_step, build_train_step,
                                           create_train_state)
    from vfdepth_tpu.utils.metrics import compute_depth_metrics

    h, w, speed = 96, 160, 0.5
    cfg = build_config(height=h, width=w, batch_size=1, mixed_precision=True,
                      learning_rate=2e-4, max_depth=80.0, eval_max_depth=80)
    model = VFDepthModel(cfg)

    def gt_pose(params, stats, batch, train):
        exts, exts_inv = batch["extrinsics"], batch["extrinsics_inv"]
        mats = []
        for f in model.frame_ids[1:]:
            shift = jnp.eye(4).at[0, 3].set(-f * speed)
            mats.append(jnp.einsum("bcij,jk,bckl->bcil", exts_inv, shift,
                                   exts))
        return jnp.stack(mats, axis=2), stats

    model.predict_pose = gt_pose
    ds = SyntheticSceneDataset(num_samples=4, num_cams=6, height=h, width=w,
                               fusion_level=2, speed=speed)
    batches = [{k: jnp.asarray(v) for k, v in ds.batch([i]).items()}
               for i in range(len(ds))]
    rng = jax.random.PRNGKey(0)
    state, tx = create_train_state(model, rng, batches[0],
                                   steps_per_epoch=10_000)
    step = build_train_step(model, tx, donate=False)
    eval_step = build_eval_step(model)

    def abs_rel(state):
        out, _ = eval_step(state, batches[0], rng)
        m, _, _ = compute_depth_metrics(
            np.asarray(batches[0]["depth"]), np.asarray(out["depth/0"]),
            np.asarray(batches[0]["mask"]), 0.5, 80.0)
        return m["abs_rel"]

    before = abs_rel(state)
    n = int(os.environ.get("LEARN_TEST_STEPS", "150"))
    for i in range(n):
        state, logs = step(state, batches[i % len(batches)], rng)
    jax.block_until_ready(logs["total_loss"])
    after = abs_rel(state)
    assert np.isfinite(after)
    # 0.678 -> ~0.25 at 150 steps full-res; demand a robust 30% improvement
    assert after < 0.7 * before, f"abs_rel did not improve: {before} -> {after}"


def _run_cold_start(speed: float, n: int, stopped_every: int = 0,
                    overrides: dict = None):
    """Joint cold-start training on the synthetic scene at the given
    ego-speed; returns (abs_rel before, abs_rel after). ``stopped_every``
    > 0 interleaves one ZERO-motion sample per that many moving ones (a
    stopped-vehicle segment — common in DDAD/nuScenes). ``overrides`` are
    extra training-section config keys (regime-specific recipe knobs).

    These tests run at the VALIDATED probe regime — 192x320, 8 samples,
    warmup 600 / ramp 600 (docs/PERF.md "Learning validation"). The
    previous 96x160/4-sample/short-schedule regime sat on a knife edge:
    round-3 code passed it and round-4 code collapsed into the max-depth
    basin (0.84 -> 3.4 abs_rel) even though a cross-version gradient diff
    on identical weights showed only fp-level drift (worst leaf 1.4e-6
    absolute) — i.e. the reduced regime's outcome flips on fp noise and
    guards nothing. The validated regime is what the from-scratch claim
    rests on, so it is what the test runs (~15-20 min/variant on v5e)."""
    from vfdepth_tpu.presets import build_config
    from vfdepth_tpu.data.synthetic_scene import SyntheticSceneDataset
    from vfdepth_tpu.training.model import VFDepthModel
    from vfdepth_tpu.training.step import (build_eval_step, build_train_step,
                                           create_train_state)
    from vfdepth_tpu.utils.metrics import compute_depth_metrics

    h = int(os.environ.get("LEARN_TEST_CS_H", "192"))
    w = int(os.environ.get("LEARN_TEST_CS_W", "320"))
    cfg = build_config(height=h, width=w, batch_size=1, mixed_precision=True,
                       learning_rate=2e-4, max_depth=80.0, eval_max_depth=80)
    cfg.set("cold_start_warmup_steps", min(600, n // 3), section="training")
    cfg.set("cold_start_ramp_steps", min(600, n // 3), section="training")
    for k, v in (overrides or {}).items():
        cfg.set(k, v, section="training")
    model = VFDepthModel(cfg)

    ds = SyntheticSceneDataset(num_samples=8, num_cams=6, height=h, width=w,
                               fusion_level=2, speed=speed)
    batches = [{k: jnp.asarray(v) for k, v in ds.batch([i]).items()}
               for i in range(len(ds))]
    if stopped_every:
        ds0 = SyntheticSceneDataset(num_samples=2, num_cams=6, height=h,
                                    width=w, fusion_level=2, speed=0.0)
        stopped = [{k: jnp.asarray(v) for k, v in ds0.batch([i]).items()}
                   for i in range(len(ds0))]
        mixed = []
        for i, b in enumerate(batches * 2):
            mixed.append(b)
            if (i + 1) % stopped_every == 0:
                mixed.append(stopped[i % len(stopped)])
        batches = mixed
    rng = jax.random.PRNGKey(0)
    state, tx = create_train_state(model, rng, batches[0],
                                   steps_per_epoch=10_000)
    step = build_train_step(model, tx, donate=False)
    eval_step = build_eval_step(model)

    def abs_rel(state):
        out, _ = eval_step(state, batches[0], rng)
        m, _, _ = compute_depth_metrics(
            np.asarray(batches[0]["depth"]), np.asarray(out["depth/0"]),
            np.asarray(batches[0]["mask"]), 0.5, 80.0)
        return m["abs_rel"]

    before = abs_rel(state)
    for i in range(n):
        # the ramp is driven by state.step inside the compiled step
        state, logs = step(state, batches[i % len(batches)], rng)
    jax.block_until_ready(logs["total_loss"])
    after = abs_rel(state)
    print(f"[cold-start] speed={speed} stopped_every={stopped_every} "
          f"n={n}: abs_rel {before:.4f} -> {after:.4f}", flush=True)
    return before, after


@pytest.mark.slow
def test_cold_start_joint_training_improves_depth():
    """FULL joint training from a RANDOM init — no GT-pose crutch, no
    pretrained encoders — must improve depth under the staged cold-start
    recipe (temporal-only warmup, then the overlap coefficients ramp in).
    This is the in-environment path to accuracy parity without ImageNet
    weights (VERDICT r2 #2); without the recipe this run collapses to max
    depth (docs/PERF.md "Learning validation")."""
    n = int(os.environ.get("LEARN_TEST_CS_STEPS", "2400"))
    before, after = _run_cold_start(0.5, n)
    assert np.isfinite(after)
    # joint training must not collapse (collapse lands ~1.0+ as depth
    # saturates) and must beat the random-init error materially
    assert after < 0.6 * before, (
        f"cold-start joint training did not improve: {before} -> {after}")


@pytest.mark.slow
@pytest.mark.parametrize("speed,budget_scale,overrides", [
    # slow (creeping traffic): the joint ramp collapses warmup's gains at
    # weak parallax (measured 0.345 -> 3.3, docs/PERF.md round-5); the
    # staggered schedule (spatio locks the metric scale before the
    # pose-composed ST term arrives) is the weak-parallax recipe. NO boost:
    # at 0.1 m/frame the prior floor EQUALS the true motion and a boosted
    # pose overshoots it (measured: boost made 3.3 into 5.3).
    (0.1, 1, {"cold_start_stagger_ramps": True}),
    # fast (~54 km/h at 10 Hz): |t|=1.5 sits above the default prior
    # ceiling (1.0, which actively fought the true scale: measured stall
    # at 0.879) and Adam's update magnitude bounds |t| growth at ~lr/step,
    # so the fast-ego recipe raises the ceiling, boosts the pose net's
    # update scale 5x while the schedule is alive (fading to exactly
    # reference Adam), and doubles the budget (the pose must travel 3x the
    # 0.5 m/frame distance; measured at the 1x budget: 0.496, still
    # descending short of the bar).
    (1.5, 2, {"cold_start_pose_ceil": 2.5, "cold_start_stagger_ramps": True,
              "cold_start_pose_lr_boost": 5.0}),
])
def test_cold_start_speed_robustness(speed, budget_scale, overrides):
    """The cold-start defaults are tuned at 0.5 m/frame; the slow
    (0.1 m/frame) and fast (1.5 m/frame) regimes each carry their
    documented recipe knobs (docs/PERF.md round-5 stress results — each
    knob is mechanism-matched and measured). The priors and schedules all
    fade to the exact reference objective, so convergence — not final
    accuracy — is what's asserted."""
    n = int(os.environ.get("LEARN_TEST_CS_STEPS", "2400")) * budget_scale
    before, after = _run_cold_start(speed, n, overrides=overrides)
    assert np.isfinite(after)
    assert after < 0.6 * before, (
        f"cold start at speed {speed} did not improve: {before} -> {after}")


@pytest.mark.slow
def test_cold_start_with_stopped_frames():
    """A stopped-vehicle segment (zero-motion samples mixed 1-in-4) must not
    derail the recipe: stopped frames carry no temporal-parallax signal and
    their identity warps fight the pose-magnitude floor — both effects must
    wash out against the moving majority. The step budget is scaled by the
    mix factor (4/3) so the run sees the same number of MOVING frames as
    the baseline variant — the assertion is about robustness to the mix,
    not about learning from frames that carry no signal (the round-5 run at
    the unscaled budget reached 0.534, still descending — docs/PERF.md)."""
    n = int(os.environ.get("LEARN_TEST_CS_STEPS", "2400"))
    stopped_every = 3
    n = (n * (stopped_every + 1)) // stopped_every
    before, after = _run_cold_start(0.5, n, stopped_every=stopped_every)
    assert np.isfinite(after)
    assert after < 0.6 * before, (
        f"cold start with stopped frames did not improve: {before} -> {after}")
