"""Step-time ablations on TPU: isolate where the milliseconds go.

Variants:
  full        — complete train step (reference pipeline)
  nospatio    — spatio + spatio-temporal losses off (drops ~12 warps)
  noalign     — intensity alignment off
  depthonly   — depth net + dummy loss (isolates encoder+VFNet fwd/bwd)
  fwdonly     — full forward, no gradient
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

from vfdepth_tpu.presets import ddad_bench_config  # noqa: E402
from vfdepth_tpu.data.fake import FakeDataset  # noqa: E402
from vfdepth_tpu.training.model import VFDepthModel  # noqa: E402
from vfdepth_tpu.training.step import create_train_state, build_train_step  # noqa: E402


def bench_step(tag, model, batch, rng, iters=8):
    state, tx = create_train_state(model, rng, batch, steps_per_epoch=1000)
    step = build_train_step(model, tx)
    t = time.time()
    state, logs = step(state, batch, rng)
    jax.block_until_ready(logs["total_loss"])
    print(f"{tag}: compile {time.time()-t:.0f}s", flush=True)
    t = time.time()
    for _ in range(iters):
        state, logs = step(state, batch, rng)
    jax.block_until_ready(logs["total_loss"])
    print(f"{tag}: {(time.time()-t)/iters*1000:.0f} ms/step", flush=True)


def bench_depthonly(model, batch, rng, iters=8):
    from vfdepth_tpu.training.step import make_optimizer
    import optax

    params, stats = model.init(rng, batch)
    tx = make_optimizer(1e-4, 15, 1000)
    opt_state = tx.init(params)

    def loss_fn(p):
        disps, _, _, _ = model.predict_depth(p["depth_net"], stats["depth_net"],
                                             batch, rng, train=True)
        return jnp.mean(disps[0])

    @jax.jit
    def step(p, o):
        g = jax.grad(loss_fn)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o

    t = time.time()
    params2, opt2 = step(params, opt_state)
    jax.block_until_ready(jax.tree_util.tree_leaves(params2)[0])
    print(f"depthonly: compile {time.time()-t:.0f}s", flush=True)
    t = time.time()
    for _ in range(iters):
        params2, opt2 = step(params2, opt2)
    jax.block_until_ready(jax.tree_util.tree_leaves(params2)[0])
    print(f"depthonly: {(time.time()-t)/iters*1000:.0f} ms/step", flush=True)


def bench_fwdonly(model, batch, rng, iters=8):
    params, stats = model.init(rng, batch)

    @jax.jit
    def fwd(p, s, b):
        _, (loss, _), _ = model.forward(p, s, b, rng, train=False)
        return loss

    t = time.time()
    v = fwd(params, stats, batch)
    jax.block_until_ready(v)
    print(f"fwdonly: compile {time.time()-t:.0f}s", flush=True)
    t = time.time()
    for _ in range(iters):
        v = fwd(params, stats, batch)
    jax.block_until_ready(v)
    print(f"fwdonly: {(time.time()-t)/iters*1000:.0f} ms/step", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    bf16 = os.environ.get("ABLATE_BF16", "1") == "1"
    cfg = ddad_bench_config(batch_size=1, mixed_precision=bf16)
    ds = FakeDataset(num_samples=1, num_cams=6, height=384, width=640,
                     fusion_level=2)
    batch = {k: jnp.asarray(v) for k, v in ds.batch([0]).items()}
    rng = jax.random.PRNGKey(0)

    if which in ("all", "full"):
        bench_step("full", VFDepthModel(cfg), batch, rng)
    if which in ("all", "nospatio"):
        c = ddad_bench_config(batch_size=1, mixed_precision=bf16)
        c.set("spatio", False)
        c.set("spatio_temporal", False)
        bench_step("nospatio", VFDepthModel(c), batch, rng)
    if which in ("all", "noalign"):
        c = ddad_bench_config(batch_size=1, mixed_precision=bf16)
        c.set("intensity_align", False)
        bench_step("noalign", VFDepthModel(c), batch, rng)
    if which in ("all", "depthonly"):
        bench_depthonly(VFDepthModel(cfg), batch, rng)
    if which in ("all", "fwdonly"):
        bench_fwdonly(VFDepthModel(cfg), batch, rng)
    print("ABLATE DONE", flush=True)


if __name__ == "__main__":
    main()
