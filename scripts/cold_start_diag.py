"""Cold-start diagnostic: trajectory telemetry for the stress variants.

Runs the exact regime of tests/test_learning_tpu.py::_run_cold_start at a
given ego-speed, logging abs_rel / |t| / disp stats every LOG_EVERY steps —
pins WHERE a failing variant leaves the rails (during warmup, during the
ramp, or post-fade drift) and WHAT moves first (pose scale vs depth scale).

Usage: python scripts/cold_start_diag.py <speed> [n_steps] [stopped_every]
Writes one JSON line per checkpoint to stdout.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    speed = float(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2400
    stopped_every = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    log_every = int(os.environ.get("LOG_EVERY", "200"))

    from vfdepth_tpu.presets import build_config
    from vfdepth_tpu.data.synthetic_scene import SyntheticSceneDataset
    from vfdepth_tpu.training.model import VFDepthModel
    from vfdepth_tpu.training.step import (build_eval_step, build_train_step,
                                           create_train_state)
    from vfdepth_tpu.utils.metrics import compute_depth_metrics

    h, w = 192, 320
    cfg = build_config(height=h, width=w, batch_size=1, mixed_precision=True,
                       learning_rate=2e-4, max_depth=80.0, eval_max_depth=80)
    cfg.set("cold_start_warmup_steps", min(600, n // 3), section="training")
    cfg.set("cold_start_ramp_steps", min(600, n // 3), section="training")
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
    rng = jax.random.PRNGKey(int(os.environ.get("DIAG_SEED", "0")))
    state, tx = create_train_state(model, rng, batches[0],
                                   steps_per_epoch=10_000)
    step = build_train_step(model, tx, donate=False)
    eval_step = build_eval_step(model)

    def snapshot(state, logs=None):
        out, _ = eval_step(state, batches[0], rng)
        m, _, scales = compute_depth_metrics(
            np.asarray(batches[0]["depth"]), np.asarray(out["depth/0"]),
            np.asarray(batches[0]["mask"]), 0.5, 80.0)
        rec = {"abs_rel": round(float(m["abs_rel"]), 4),
               "a1": round(float(m["a1"]), 4),
               "med_scale": round(float(np.median(scales)), 3)}
        if logs is not None:
            for k in ("total_loss", "reproj_loss", "amask_cover",
                      "depth/mean", "depth/max", "pose/tx", "pose/ty",
                      "pose/tz", "cold_start/pose_prior",
                      "cold_start/disp_anchor", "overlap_ramp"):
                if k in logs:
                    rec[k] = round(float(logs[k]), 5)
        return rec

    print(json.dumps({"step": 0, **snapshot(state)}), flush=True)
    logs = None
    for i in range(n):
        state, logs = step(state, batches[i % len(batches)], rng)
        if (i + 1) % log_every == 0:
            print(json.dumps({"step": i + 1, **snapshot(state, logs)}),
                  flush=True)


if __name__ == "__main__":
    main()
