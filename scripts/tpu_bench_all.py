"""Consolidated TPU measurement: kernel timings + full train-step bench.

Run in background (compiles through the axon tunnel are slow and variable);
results append to stdout as they arrive.
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


def timed(tag, fn, *args, iters=5):
    t = time.time()
    r = fn(*args)
    jax.block_until_ready(r)
    compile_s = time.time() - t
    t = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{tag}: compile+run {compile_s:.1f}s, run {(time.time()-t)/iters*1000:.1f}ms",
          flush=True)
    return r


def kernel_timings():
    from vfdepth_tpu.ops.pallas_sample import sample_bilinear_pallas

    b, h, w, c, n = 6, 48, 80, 257, 200000
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.2, 1.2, (b, n, 2)).astype(np.float32))

    f = jax.jit(lambda i, cc: jnp.sum(sample_bilinear_pallas(i, cc)))
    timed("pallas2d fwd (6x200k x257)", f, img, coords)
    g = jax.jit(jax.grad(lambda i: jnp.sum(sample_bilinear_pallas(i, coords) ** 2)))
    timed("pallas2d bwd", g, img)


def full_bench(batch_size, bf16):
    from vfdepth_tpu.config import Config, get_relcam, DDAD_CAM_LIST
    from vfdepth_tpu.data.fake import FakeDataset
    from vfdepth_tpu.training.model import VFDepthModel
    from vfdepth_tpu.training.step import create_train_state, build_train_step

    cameras = DDAD_CAM_LIST
    cfg = Config({
        "model": {
            "num_layers": 18, "weights_init": False,
            "depth_model": "fusion", "pose_model": "fusion",
            "fusion_level": 2, "fusion_feat_in_dim": 256, "use_skips": False,
            "voxel_unit_size": [1.0, 1.0, 1.5], "voxel_size": [100, 100, 20],
            "voxel_str_p": [-50.0, -50.0, -15.0], "voxel_pre_dim": [64],
            "proj_d_bins": 50, "proj_d_str": 2, "proj_d_end": 50,
            "mode": "train",
        },
        "data": {"cameras": cameras, "num_cams": 6,
                 "rel_cam_list": get_relcam(cameras)},
        "training": {
            "height": 384, "width": 640, "scales": [0],
            "frame_ids": [0, -1, 1], "batch_size": batch_size,
            "min_depth": 1.5, "max_depth": 200.0,
            "spatio": True, "spatio_temporal": True, "intensity_align": True,
            "focal_length_scale": 300, "aug_depth": False,
            "aug_angle": [15, 15, 40], "learning_rate": 1e-4,
            "num_epochs": 20, "scheduler_step_size": 15,
        },
        "loss": {"disparity_smoothness": 0.001, "spatio_coeff": 0.03,
                 "spatio_tempo_coeff": 0.1, "pose_loss_coeff": 0.0},
        "eval": {"eval_batch_size": 1, "eval_min_depth": 0,
                 "eval_max_depth": 200, "eval_visualize": False,
                 "syn_visualize": False, "syn_idx": 0},
        "tpu": {"mixed_precision": bf16},
    })
    model = VFDepthModel(cfg)
    ds = FakeDataset(num_samples=batch_size, num_cams=6, height=384, width=640,
                     fusion_level=2)
    batch = {k: jnp.asarray(v) for k, v in
             ds.batch(list(range(batch_size))).items()}
    rng = jax.random.PRNGKey(0)
    t = time.time()
    state, tx = create_train_state(model, rng, batch, steps_per_epoch=1000)
    print(f"[b{batch_size} bf16={bf16}] init {time.time()-t:.1f}s", flush=True)
    step = build_train_step(model, tx)
    t = time.time()
    state, logs = step(state, batch, rng)
    jax.block_until_ready(logs["total_loss"])
    print(f"[b{batch_size} bf16={bf16}] step compile+run {time.time()-t:.1f}s "
          f"loss={float(logs['total_loss']):.4f}", flush=True)
    t = time.time()
    n_steps = 10
    for _ in range(n_steps):
        state, logs = step(state, batch, rng)
    jax.block_until_ready(logs["total_loss"])
    dt = (time.time() - t) / n_steps
    print(f"[b{batch_size} bf16={bf16}] {1.0/dt:.3f} steps/s "
          f"({dt*1000:.0f} ms/step, {batch_size*6/dt:.1f} imgs/s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "kernel"):
        kernel_timings()
    if which in ("all", "b1"):
        full_bench(1, False)
    if which in ("all", "b1bf16"):
        full_bench(1, True)
    if which in ("all", "b2bf16"):
        full_bench(2, True)
    print("ALL DONE", flush=True)
