"""Fused-scatter 3D sampler VJP parity vs autodiff through the gather form."""
import numpy as np
import jax
import jax.numpy as jnp

from vfdepth_tpu.ops.grid_sample import grid_sample_3d, grid_sample_3d_nocoordgrad


def test_forward_identical():
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(2, 4, 5, 6, 3).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.3, 1.3, (2, 50, 3)).astype(np.float32))
    a = np.asarray(grid_sample_3d(vol, coords))
    b = np.asarray(grid_sample_3d_nocoordgrad(vol, coords))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_vol_gradient_matches_autodiff():
    rng = np.random.RandomState(1)
    vol = jnp.asarray(rng.randn(1, 3, 4, 5, 2).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.2, 1.2, (1, 6, 7, 3)).astype(np.float32))

    g_auto = jax.grad(lambda v: jnp.sum(grid_sample_3d(v, coords) ** 2))(vol)
    g_fused = jax.grad(lambda v: jnp.sum(grid_sample_3d_nocoordgrad(v, coords) ** 2))(vol)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_auto), atol=1e-5)


def test_coord_gradient_is_zero():
    rng = np.random.RandomState(2)
    vol = jnp.asarray(rng.randn(1, 3, 4, 5, 2).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 20, 3)).astype(np.float32))
    g = jax.grad(lambda c: jnp.sum(grid_sample_3d_nocoordgrad(vol, c)))(coords)
    np.testing.assert_allclose(np.asarray(g), 0.0)
