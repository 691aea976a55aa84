"""Time the 3D sampler backward variants on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vfdepth_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from vfdepth_tpu.ops.grid_sample import grid_sample_3d, grid_sample_3d_nocoordgrad  # noqa: E402


def timed(tag, fn, *args, iters=5):
    t = time.time()
    r = fn(*args)
    jax.block_until_ready(r)
    print(f"{tag}: compile+run {time.time()-t:.1f}s", flush=True)
    t = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{tag}: run {(time.time()-t)/iters*1000:.1f}ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(1, 20, 100, 100, 64).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.1, 1.1, (1, 6, 50, 3840, 3)).astype(np.float32))

    g_pair = jax.jit(jax.grad(
        lambda v: jnp.sum(grid_sample_3d_nocoordgrad(v, coords) ** 2)))
    timed("pair-window custom vjp bwd", g_pair, vol)

    g_auto = jax.jit(jax.grad(
        lambda v: jnp.sum(grid_sample_3d(v, coords) ** 2)))
    timed("autodiff 8-scatter bwd", g_auto, vol)


if __name__ == "__main__":
    main()
