"""Cold-start seed-margin guard: the validated-regime convergence run at
several PRNG seeds, sharing one compiled step program.

VERDICT r4 #5: the from-scratch claim rested on ONE trajectory while the
builder's own bisection showed reduced-regime outcomes flip on fp noise.
This measures the margin at the VALIDATED regime (192x320, 8 samples,
warmup 600 / ramp 600, 2400 steps — docs/PERF.md "Learning validation"):
every seed must converge, and the abs_rel spread is recorded.

The model/step are built once; each seed re-initializes parameters only,
so the XLA step compile is shared (init retraces per seed, ~1 min each).

Usage: python scripts/cold_start_multiseed.py [seeds...]   (default: 1 2 3;
seed 0 is exercised by tests/test_learning_tpu.py's baseline variant)
Prints one JSON line per seed and a final spread line.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    seeds = [int(s) for s in sys.argv[1:]] or [1, 2, 3]
    n = int(os.environ.get("CS_STEPS", "2400"))

    from vfdepth_tpu.presets import build_config
    from vfdepth_tpu.data.synthetic_scene import SyntheticSceneDataset
    from vfdepth_tpu.training.model import VFDepthModel
    from vfdepth_tpu.training.step import (build_eval_step, build_train_step,
                                           create_train_state)
    from vfdepth_tpu.utils.metrics import compute_depth_metrics

    h, w, speed = 192, 320, 0.5
    cfg = build_config(height=h, width=w, batch_size=1, mixed_precision=True,
                       learning_rate=2e-4, max_depth=80.0, eval_max_depth=80)
    cfg.set("cold_start_warmup_steps", min(600, n // 3), section="training")
    cfg.set("cold_start_ramp_steps", min(600, n // 3), section="training")
    # schedule-variant knobs for attribution runs (docs/PERF.md round-5)
    if os.environ.get("CS_CEIL"):
        cfg.set("cold_start_pose_ceil", float(os.environ["CS_CEIL"]),
                section="training")
    if os.environ.get("CS_STAGGER"):
        cfg.set("cold_start_stagger_ramps", True, section="training")
    model = VFDepthModel(cfg)

    ds = SyntheticSceneDataset(num_samples=8, num_cams=6, height=h, width=w,
                               fusion_level=2, speed=speed)
    batches = [{k: jnp.asarray(v) for k, v in ds.batch([i]).items()}
               for i in range(len(ds))]

    step = None
    eval_step = None
    results = {}
    for seed in seeds:
        rng = jax.random.PRNGKey(seed)
        state, tx = create_train_state(model, rng, batches[0],
                                       steps_per_epoch=10_000)
        if step is None:  # tx is seed-independent; share the jit wrappers
            step = build_train_step(model, tx, donate=False)
            eval_step = build_eval_step(model)

        def abs_rel(state):
            out, _ = eval_step(state, batches[0], rng)
            m, _, _ = compute_depth_metrics(
                np.asarray(batches[0]["depth"]), np.asarray(out["depth/0"]),
                np.asarray(batches[0]["mask"]), 0.5, 80.0)
            return float(m["abs_rel"])

        before = abs_rel(state)
        for i in range(n):
            state, logs = step(state, batches[i % len(batches)], rng)
        jax.block_until_ready(logs["total_loss"])
        after = abs_rel(state)
        results[seed] = (before, after)
        print(json.dumps({"seed": seed, "abs_rel_before": round(before, 4),
                          "abs_rel_after": round(after, 4),
                          "converged": bool(after < 0.6 * before)}),
              flush=True)

    afters = [a for _, a in results.values()]
    print(json.dumps({"seeds": seeds, "abs_rel_min": round(min(afters), 4),
                      "abs_rel_max": round(max(afters), 4),
                      "spread": round(max(afters) - min(afters), 4),
                      "all_converged": bool(all(
                          a < 0.6 * b for b, a in results.values()))}),
          flush=True)


if __name__ == "__main__":
    main()
