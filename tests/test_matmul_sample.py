"""XLA one-hot-matmul sampler (CPU-testable fallback of the Pallas kernel)."""
import numpy as np
import jax
import jax.numpy as jnp

from vfdepth_tpu.ops.grid_sample import grid_sample_2d
from vfdepth_tpu.ops.matmul_sample import sample_bilinear_mm


def test_forward_matches_gather():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 6, 9, 5).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.3, 1.3, (2, 300, 2)).astype(np.float32))
    got = np.asarray(sample_bilinear_mm(img, coords, mm_bf16=False))
    want = np.asarray(grid_sample_2d(img, coords))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_backward_matches_gather():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(1, 5, 7, 3).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.1, 1.1, (1, 200, 2)).astype(np.float32))

    g_mm = jax.grad(lambda i: jnp.sum(sample_bilinear_mm(i, coords, mm_bf16=False) ** 2))(img)
    g_ref = jax.grad(lambda i: jnp.sum(grid_sample_2d(i, coords) ** 2))(img)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref), atol=1e-4)


def test_zero_coord_gradient():
    img = jnp.ones((1, 4, 4, 2))
    coords = jnp.asarray(np.random.RandomState(2).uniform(-0.9, 0.9, (1, 40, 2)).astype(np.float32))
    g = jax.grad(lambda c: jnp.sum(sample_bilinear_mm(img, c)))(coords)
    np.testing.assert_allclose(np.asarray(g), 0.0)
