"""Time the Pallas kernel with realistic (wedge-visibility) coords.

Each timed fn returns a scalar that is float()-fetched every iteration
(lagged by one) — through the remote-execution tunnel block_until_ready
alone can return before the work runs.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from vfdepth_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
from vfdepth_tpu.ops.pallas_sample import sample_bilinear_pallas  # noqa: E402


def timed(tag, fn, *args, iters=10):
    float(fn(*args))
    prev = None
    t = time.time()
    for _ in range(iters):
        r = fn(*args)
        if prev is not None:
            float(prev)
        prev = r
    float(prev)
    print(f"{tag}: {(time.time()-t)/iters*1000:.1f}ms", flush=True)


def main():
    b, h, w, c, n = 6, 48, 80, 257, 200000
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    cases = {}
    for frac in (1.0, 0.35):
        co = rng.uniform(-1.0, 1.0, (b, n, 2)).astype(np.float32)
        if frac < 1.0:
            keep = int(n * frac)
            co[:, keep:, :] = -3.0
        cases["dense" if frac == 1.0 else "wedge35"] = co
    # voxel-ordered: each 256-pt sub-tile is an x-row arc (y nearly
    # constant) like real [z, y, x]-ordered back-projections; 40% of
    # sub-tiles fully out of FOV
    co = np.empty((b, n, 2), np.float32)
    for i in range(0, n, 256):
        m = min(256, n - i)
        yc = rng.uniform(-1.1, 1.1)
        co[:, i:i + m, 1] = yc + rng.uniform(-0.03, 0.03, (b, m))
        x0 = rng.uniform(-1.5, 0.5)
        co[:, i:i + m, 0] = x0 + np.linspace(0, 1.0, m)[None]
        if rng.rand() < 0.4:
            co[:, i:i + m, :] = -3.0
    cases["ordered"] = co

    for tag, co in cases.items():
        coords = jnp.asarray(co)
        f = jax.jit(lambda i, cc: jnp.sum(
            sample_bilinear_pallas(i, cc).astype(jnp.float32)))
        timed(f"fwd {tag}", f, img, coords)
        g = jax.jit(lambda i, cc: jnp.sum(jax.grad(
            lambda ii: jnp.sum(sample_bilinear_pallas(ii, cc).astype(jnp.float32) ** 2)
        )(i) ** 2))
        timed(f"fwd+bwd {tag}", g, img, coords)


if __name__ == "__main__":
    main()
