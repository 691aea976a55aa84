"""Device-time kernel microbenchmark (consolidated time_pallas* probes): N kernel calls chained INSIDE one jit
(fori_loop with value feedback) — immune to the axon tunnel's per-dispatch
latency, which floors naive per-iteration timing at ~10-25 ms."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from vfdepth_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
from vfdepth_tpu.ops.pallas_sample import (
    sample_bilinear_with_nearest_mask_pallas)
from time_pallas3 import real_coords

REPS = 20

def bench(tag, make_fn, *args):
    fn = jax.jit(make_fn)
    float(fn(*args))  # compile
    t = time.time()
    r = float(fn(*args))
    dt = (time.time() - t) / REPS * 1000
    print(f"{tag}: {dt:.2f} ms/call (total {dt*REPS:.0f} ms)", flush=True)

def main():
    coords = real_coords()
    rng = np.random.RandomState(0)
    mask = jnp.asarray((rng.rand(6, 48, 80, 1) > 0.1).astype(np.float32))

    # dispatch floor
    x0 = jnp.ones((8, 128))
    bench("floor(sum tiny)", lambda x: jnp.sum(x), x0)

    for c in (257, 513):
        img = jnp.asarray(rng.randn(6, 48, 80, c - 1).astype(np.float32))

        def fwd_loop(img, mask, coords):
            def body(i, acc):
                out = sample_bilinear_with_nearest_mask_pallas(
                    img + acc * 1e-30, mask, coords)
                return acc + jnp.sum(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, REPS, body, 0.0)
        bench(f"fwd masked C={c}", fwd_loop, img, mask, coords)

        def bwd_loop(img, mask, coords):
            gf = jax.grad(lambda ii: jnp.sum(
                sample_bilinear_with_nearest_mask_pallas(
                    ii, mask, coords).astype(jnp.float32) ** 2))
            def body(i, acc):
                return acc + jnp.sum(gf(img + acc * 1e-30) ** 2)
            return jax.lax.fori_loop(0, REPS, body, 0.0)
        bench(f"fwd+bwd masked C={c}", bwd_loop, img, mask, coords)

if __name__ == "__main__":
    main()
