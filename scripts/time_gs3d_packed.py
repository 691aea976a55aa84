"""Time the packed 3D sampler vs the gather/scatter form on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vfdepth_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from vfdepth_tpu.ops.grid_sample import grid_sample_3d_nocoordgrad  # noqa: E402
from vfdepth_tpu.ops.sample3d_packed import grid_sample_3d_packed  # noqa: E402


def timed(tag, fn, *args, iters=10):
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
    dt = jnp.bfloat16 if os.environ.get("BF16", "1") == "1" else jnp.float32
    vol = jnp.asarray(rng.randn(1, 20, 100, 100, 64), dtype=dt)
    coords = jnp.asarray(
        rng.uniform(-1.1, 1.1, (1, 6 * 50 * 3840, 3)).astype(np.float32))

    f_packed = jax.jit(lambda v: grid_sample_3d_packed(v, coords))
    timed("packed fwd", f_packed, vol)
    g_packed = jax.jit(jax.grad(
        lambda v: jnp.sum(grid_sample_3d_packed(v, coords).astype(jnp.float32) ** 2)))
    timed("packed fwd+bwd", g_packed, vol)

    f_g = jax.jit(lambda v: grid_sample_3d_nocoordgrad(v, coords))
    timed("gather fwd", f_g, vol)
    g_g = jax.jit(jax.grad(
        lambda v: jnp.sum(grid_sample_3d_nocoordgrad(v, coords).astype(jnp.float32) ** 2)))
    timed("gather fwd+bwd", g_g, vol)


if __name__ == "__main__":
    main()
