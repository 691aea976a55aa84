"""Timing microbenchmark for the Pallas bilinear-sampling kernel (TPU)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vfdepth_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from vfdepth_tpu.ops.pallas_sample import sample_bilinear_pallas  # noqa: E402


def main():
    b, h, w, c, n = 6, 48, 80, 257, 200000
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.2, 1.2, (b, n, 2)).astype(np.float32))

    f = jax.jit(lambda i, cc: jnp.sum(sample_bilinear_pallas(i, cc)))
    v = f(img, coords)
    jax.block_until_ready(v)
    print("fwd sum", float(v), flush=True)
    t = time.time()
    for _ in range(10):
        v = f(img, coords)
    jax.block_until_ready(v)
    print(f"fwd runtime {(time.time() - t) / 10 * 1000:.1f}ms", flush=True)

    g = jax.jit(jax.grad(lambda i: jnp.sum(sample_bilinear_pallas(i, coords) ** 2)))
    d = g(img)
    jax.block_until_ready(d)
    print("bwd sq-norm", float(jnp.sum(d ** 2)), flush=True)
    t = time.time()
    for _ in range(10):
        d = g(img)
    jax.block_until_ready(d)
    print(f"bwd runtime {(time.time() - t) / 10 * 1000:.1f}ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
