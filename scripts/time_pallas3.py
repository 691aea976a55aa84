"""Time the Pallas back-projection sampler with the REAL bench geometry
(6-cam fake rig, 48x80 feats, [z, y, x]-ordered voxel projections) at both
model channel widths (depth 257, pose-merged 513). float()-fetch every
iteration (see time_pallas2.py / tpu-measurement notes)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from vfdepth_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
from vfdepth_tpu.ops.pallas_sample import (
    sample_bilinear_with_nearest_mask_pallas)


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


def real_coords():
    from vfdepth_tpu.data.fake import FakeDataset
    ds = FakeDataset(num_samples=1, num_cams=6, height=384, width=640)
    b = ds.batch([0])
    K3 = np.asarray(b["K/3"])[0]
    ext_inv = np.asarray(b["extrinsics_inv"])[0]
    h_dim, w_dim = 48, 80
    vx, vy, vz = 100, 100, 20
    gx = -50.0 + 1.0 * np.arange(vx)
    gy = -50.0 + 1.0 * np.arange(vy)
    gz = -15.0 + 1.5 * np.arange(vz)
    zz, yy, xx = np.meshgrid(gz, gy, gx, indexing="ij")
    n = vz * vy * vx
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel(), np.ones(n)], 0)
    out = np.empty((6, n, 2), np.float32)
    for cam in range(6):
        v = ext_inv[cam, :3, :] @ pts
        cp = K3[cam, :3, :3] @ v
        z = cp[2]
        x = cp[0] / (z + 1e-8)
        y = cp[1] / (z + 1e-8)
        x = np.clip(np.nan_to_num(x, nan=2 * w_dim), -2.0 * w_dim, 2.0 * w_dim)
        y = np.clip(np.nan_to_num(y, nan=2 * w_dim), -2.0 * w_dim, 2.0 * w_dim)
        nx = x * (2.0 / (w_dim - 1)) - 1.0
        ny = y * (2.0 / (h_dim - 1)) - 1.0
        # model-side sanitization (vfnet.backproject_into_voxel): points
        # that `valid` zeroes are pushed out of tap range
        ok = (z > 0) & (nx >= -1) & (nx <= 1) & (ny >= -1) & (ny <= 1)
        out[cam, :, 0] = np.where(ok, nx, -3.0)
        out[cam, :, 1] = np.where(ok, ny, -3.0)
    return jnp.asarray(out)


def main():
    coords = real_coords()
    rng = np.random.RandomState(0)
    mask = jnp.asarray((rng.rand(6, 48, 80, 1) > 0.1).astype(np.float32))
    for c in (257, 513):
        img = jnp.asarray(rng.randn(6, 48, 80, c - 1).astype(np.float32))
        f = jax.jit(lambda i, m, cc: jnp.sum(
            sample_bilinear_with_nearest_mask_pallas(i, m, cc).astype(jnp.float32)))
        timed(f"fwd masked C={c}", f, img, mask, coords)
        g = jax.jit(lambda i, m, cc: jnp.sum(jax.grad(
            lambda ii: jnp.sum(sample_bilinear_with_nearest_mask_pallas(
                ii, m, cc).astype(jnp.float32) ** 2))(i) ** 2))
        timed(f"fwd+bwd masked C={c}", g, img, mask, coords)


if __name__ == "__main__":
    main()
