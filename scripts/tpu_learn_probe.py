"""End-to-end learning probe on the analytic synthetic scene (TPU).

Trains the full fusion model with the real photometric losses on the
ground-plane scene and reports GT depth metrics over training — the
strongest available correctness signal without the real datasets: if the
geometry/losses are right, Abs.Rel against the analytic depth must drop.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vfdepth_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from vfdepth_tpu.presets import build_config  # noqa: E402
from vfdepth_tpu.data.synthetic_scene import SyntheticSceneDataset  # noqa: E402
from vfdepth_tpu.training.model import VFDepthModel  # noqa: E402
from vfdepth_tpu.training.step import create_train_state, build_train_step, build_eval_step  # noqa: E402
from vfdepth_tpu.utils.metrics import compute_depth_metrics  # noqa: E402


def main():
    steps = int(os.environ.get("PROBE_STEPS", "400"))
    height = int(os.environ.get("PROBE_H", "192"))
    width = int(os.environ.get("PROBE_W", "320"))
    # PROBE_WARMSTART=N: train the first N steps with the analytic GT pose
    # (depth-only learning), then release the pose net and continue JOINT.
    # Demonstrates that joint training is stable around a reasonable depth
    # basin and that the pose net learns real egomotion — the from-scratch
    # collapse is an init-basin property shared with the reference recipe
    # (its masked means also vanish when all overlap leaves the image; the
    # reference escapes via ImageNet encoder init, configs `weights_init`).
    warmstart = int(os.environ.get("PROBE_WARMSTART", "0"))

    cfg = build_config(height=height, width=width, batch_size=1,
                       mixed_precision=True, learning_rate=2e-4,
                       max_depth=80.0, eval_max_depth=80)
    # PROBE_COLDSTART=1: FULL joint training from a random init, no GT-pose
    # crutch, no distillation — relying on the staged recipe alone
    # (temporal-only warmup, then the overlap coefficients ramp in). The
    # in-environment path to accuracy parity without ImageNet weights.
    if os.environ.get("PROBE_COLDSTART", "0") == "1":
        warm = int(os.environ.get("PROBE_CS_WARMUP", "600"))
        ramp = int(os.environ.get("PROBE_CS_RAMP", "600"))
        cfg.set("cold_start_warmup_steps", warm, section="training")
        cfg.set("cold_start_ramp_steps", ramp, section="training")
        print(f"(cold start: temporal-only for {warm} steps, overlap "
              f"coefficients ramp over {ramp})", flush=True)
    model = VFDepthModel(cfg)

    if os.environ.get("PROBE_GT_POSE", "0") == "1" or warmstart > 0:
        # diagnostic: bypass the pose net with the analytic scripted motion
        # T_f = E_c^-1 . translate(-f*speed) . E_c  (isolates depth learning)
        # NOTE: must equal the dataset's speed below (round-1 ran this with
        # 1.5 vs the scene's 0.5 — a 3x-wrong GT pose — so its 0.44 floor
        # underestimated what GT-pose training reaches)
        speed = 0.5
        orig_predict_pose = model.predict_pose

        def gt_pose(params, stats, batch, train):
            exts = batch["extrinsics"]
            exts_inv = batch["extrinsics_inv"]
            mats = []
            for f in model.frame_ids[1:]:
                shift = jnp.eye(4).at[0, 3].set(-f * speed)
                t_f = jnp.einsum("bcij,jk,bckl->bcil", exts_inv, shift, exts)
                mats.append(t_f)
            return jnp.stack(mats, axis=2), stats

        if warmstart > 0:
            gt_pose_fn = gt_pose            # phase-1 override, see below
            print(f"(warm start: GT pose for {warmstart} steps, then "
                  f"joint)", flush=True)
        else:
            model.predict_pose = gt_pose
            print("(using analytic GT pose)", flush=True)
    ds = SyntheticSceneDataset(num_samples=8, num_cams=6, height=height,
                               width=width, fusion_level=2, speed=0.5)
    batches = [
        {k: jnp.asarray(v) for k, v in ds.batch([i]).items()}
        for i in range(len(ds))
    ]
    rng = jax.random.PRNGKey(0)
    state, tx = create_train_state(model, rng, batches[0], steps_per_epoch=10_000)
    train_step = build_train_step(model, tx, donate=False)
    eval_step = build_eval_step(model)

    warm_step = None
    distill_step = None
    if warmstart > 0:
        import copy
        model_gt = copy.copy(model)
        model_gt.predict_pose = gt_pose_fn
        warm_step = build_train_step(model_gt, tx, donate=False)

        # phase-1 side channel: teach the pose net the scripted motion so
        # the joint phase starts from sane pose predictions (PROBE_DISTILL)
        if os.environ.get("PROBE_DISTILL", "1") == "1":
            import optax
            # decoder-only distillation at a hot lr: the x0.01 output head
            # means the pre-scale target is ~50, so |delta param| ~ lr*steps
            # must reach ~50-60; the encoder stays frozen (adam at such lr
            # diverges a BN encoder)
            d_tx = optax.adam(1e-1)
            d_opt0 = d_tx.init(state.params)

            def distill(params, stats, batch, rng_):
                pred, _ = model.predict_pose(params["pose_net"],
                                             stats["pose_net"], batch, False)
                gt, _ = gt_pose_fn(None, None, batch, False)
                return jnp.mean((pred - gt) ** 2)

            @jax.jit
            def d_step(state, d_opt, batch, rng_):
                dl, g = jax.value_and_grad(distill)(
                    state.params, state.batch_stats, batch, rng_)
                # zero every gradient outside the pose decoder
                g = jax.tree_util.tree_map(jnp.zeros_like, g) | {
                    "pose_net": dict(
                        jax.tree_util.tree_map(jnp.zeros_like,
                                               g["pose_net"]),
                        pose_decoder=g["pose_net"]["pose_decoder"])}
                upd, d_opt = d_tx.update(g, d_opt, state.params)
                return state._replace(
                    params=optax.apply_updates(state.params, upd)), d_opt, dl

            distill_step = (d_step, d_opt0)

    def evaluate(state):
        m_acc = None
        for b in batches[:2]:
            outputs, _ = eval_step(state, b, rng)
            metric, median, _ = compute_depth_metrics(
                np.asarray(b["depth"]), np.asarray(outputs["depth/0"]),
                np.asarray(b["mask"]), 0.5, 80.0)
            m_acc = metric if m_acc is None else {
                k: m_acc[k] + metric[k] for k in metric}
        return {k: v / 2 for k, v in m_acc.items()}

    m0 = evaluate(state)
    print(f"step 0: abs_rel={m0['abs_rel']:.3f} rmse={m0['rms']:.2f} "
          f"a1={m0['a1']:.3f}", flush=True)

    t0 = time.time()
    for i in range(steps):
        b = batches[i % len(batches)]
        step_fn = warm_step if (warm_step is not None and i < warmstart) \
            else train_step
        if i == warmstart and warm_step is not None:
            print(f"--- releasing pose net (joint) at step {i} ---",
                  flush=True)
        state, logs = step_fn(state, b, rng)
        if distill_step is not None and i < warmstart:
            d_step, d_opt = distill_step
            state, d_opt, dloss = d_step(state, d_opt, b, rng)
            distill_step = (d_step, d_opt)
            if (i + 1) % 100 == 0:
                print(f"    distill loss {float(dloss):.5f}", flush=True)
        if (i + 1) % 100 == 0:
            jax.block_until_ready(logs["total_loss"])
            m = evaluate(state)
            tmag = (float(logs["pose/tx"]) + float(logs["pose/ty"])
                    + float(logs["pose/tz"]))
            amask = (float(logs["amask_cover"])
                     if "amask_cover" in logs else float("nan"))
            print(f"step {i+1}: loss={float(logs['total_loss']):.4f} "
                  f"abs_rel={m['abs_rel']:.3f} rmse={m['rms']:.2f} "
                  f"a1={m['a1']:.3f} |t|={tmag:.3f} amask={amask:.2f} "
                  f"depth_mean={float(logs['depth/mean']):.1f} "
                  f"({(time.time()-t0)/(i+1)*1000:.0f} ms/step)",
                  flush=True)
    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
