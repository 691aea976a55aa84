"""Time the MXU warp kernel vs the XLA gather warp on TPU (DDAD shapes).

One "warp group" = the per-step temporal warp: 12 images of 384x640
(b1 x 6 cams x 2 ctx), full-resolution coords. The training step runs 4
such groups forward (+ CSE-shared backward re-gathers).
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

from vfdepth_tpu.ops.warp_quad import warp_image_mask_quad  # noqa: E402
from vfdepth_tpu.ops.warp_mxu import warp_image_mask_mxu  # noqa: E402

B, H, W = 12, 384, 640


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # axon tunnel: fetch a scalar every iter (lagged) to force execution
    prev = None
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        if prev is not None:
            float(prev)
        prev = out[0].ravel()[0] if isinstance(out, tuple) else out.ravel()[0]
    float(prev)
    return (time.time() - t0) / iters * 1000


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    mask = jnp.asarray((rng.rand(B, H, W, 1) > 0.2).astype(np.float32))
    # realistic warp coords: identity + smooth flow + 3% NaN
    gy, gx = np.mgrid[0:H, 0:W]
    base = np.stack([gx / (W - 1) * 2 - 1, gy / (H - 1) * 2 - 1], -1)
    flow = rng.randn(B, 8, 10, 2).astype(np.float32) * 0.08
    flow = jax.image.resize(jnp.asarray(flow), (B, H, W, 2), "bilinear")
    coords = jnp.asarray(base[None] + np.asarray(flow))
    nanm = rng.rand(B, H, W, 1) < 0.03
    coords = jnp.where(jnp.asarray(nanm), jnp.nan, coords).reshape(B, H * W, 2)

    g_img = jnp.asarray(rng.rand(B, H * W, 3).astype(np.float32))

    def fwd_quad(img, mask, c):
        return warp_image_mask_quad(img, mask, c)

    def fwd_mxu(img, mask, c):
        return warp_image_mask_mxu(img, mask, c)

    def grad_quad(img, mask, c):
        def f(c):
            iw, mw = warp_image_mask_quad(img, mask, c)
            return jnp.sum(iw * g_img) + jnp.sum(mw)
        return jax.grad(f)(c)

    def grad_mxu(img, mask, c):
        def f(c):
            iw, mw = warp_image_mask_mxu(img, mask, c)
            return jnp.sum(iw * g_img) + jnp.sum(mw)
        return jax.grad(f)(c)

    for name, fn in (("fwd  quad", fwd_quad), ("fwd  mxu", fwd_mxu),
                     ("grad quad", grad_quad), ("grad mxu", grad_mxu)):
        f = jax.jit(fn)
        t = timed(f, img, mask, coords)
        print(f"{name}: {t:7.2f} ms  ({B} images {H}x{W})", flush=True)

    # cross-check values on device
    iq, mq = jax.jit(fwd_quad)(img, mask, coords)
    im, mm = jax.jit(fwd_mxu)(img, mask, coords)
    di = float(jnp.max(jnp.abs(im - iq)))
    dm = float(jnp.max(jnp.abs(mm - mq)))
    print(f"max |img diff| = {di:.2e}  max |mask diff| = {dm:.2e}", flush=True)


if __name__ == "__main__":
    main()
