"""Row-packed 3D sampler parity vs the gather reference (fwd + VJP)."""
import numpy as np
import jax
import jax.numpy as jnp

from vfdepth_tpu.ops.grid_sample import grid_sample_3d
from vfdepth_tpu.ops.sample3d_packed import grid_sample_3d_packed


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


def test_forward_matches_gather_reference():
    rng = np.random.RandomState(0)
    vol = _rand(rng, 2, 4, 5, 6, 3)
    coords = jnp.asarray(rng.uniform(-1.3, 1.3, (2, 60, 3)).astype(np.float32))
    a = np.asarray(grid_sample_3d(vol, coords))
    b = np.asarray(grid_sample_3d_packed(vol, coords))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_forward_nonfinite_coords_zero():
    rng = np.random.RandomState(1)
    vol = _rand(rng, 1, 3, 4, 5, 2)
    coords = np.asarray(rng.uniform(-0.8, 0.8, (1, 10, 3)), np.float32)
    coords[0, 3, 1] = np.nan
    coords[0, 7, 0] = np.inf
    out = np.asarray(grid_sample_3d_packed(vol, jnp.asarray(coords)))
    np.testing.assert_allclose(out[0, 3], 0.0)
    np.testing.assert_allclose(out[0, 7], 0.0)


def test_forward_exact_corners_and_borders():
    """Points exactly on grid nodes and just outside the border."""
    rng = np.random.RandomState(2)
    vol = _rand(rng, 1, 3, 4, 5, 2)
    node = jnp.asarray([[[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0],
                         [-1.002, 0.0, 0.0], [0.0, 1.002, 0.0]]], jnp.float32)
    a = np.asarray(grid_sample_3d(vol, node))
    b = np.asarray(grid_sample_3d_packed(vol, node))
    np.testing.assert_allclose(a, b, atol=1e-5)
    np.testing.assert_allclose(b[0, 0], np.asarray(vol)[0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(b[0, 1], np.asarray(vol)[0, -1, -1, -1], atol=1e-6)


def test_vol_gradient_matches_autodiff():
    rng = np.random.RandomState(3)
    vol = _rand(rng, 2, 3, 4, 5, 2)
    coords = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 6, 7, 3)).astype(np.float32))
    g_auto = jax.grad(lambda v: jnp.sum(grid_sample_3d(v, coords) ** 2))(vol)
    g_packed = jax.grad(lambda v: jnp.sum(
        grid_sample_3d_packed(v, coords, "f32") ** 2))(vol)
    np.testing.assert_allclose(np.asarray(g_packed), np.asarray(g_auto),
                               atol=1e-4, rtol=1e-4)


def test_vol_gradient_bf16_updates_close():
    """The default bf16 backward-scatter updates quantize each tap product
    to ~2^-8 relative; the aggregate gradient must stay essentially parallel
    to the exact one (this is the default in-model configuration)."""
    rng = np.random.RandomState(5)
    vol = _rand(rng, 1, 4, 6, 6, 8)
    coords = jnp.asarray(rng.uniform(-1.1, 1.1, (1, 500, 3)).astype(np.float32))
    loss = lambda v, gd: jnp.sum(grid_sample_3d_packed(v, coords, gd) ** 2)
    g32 = np.asarray(jax.grad(loss)(vol, "f32")).ravel()
    g16 = np.asarray(jax.grad(loss)(vol, "bf16")).ravel()
    cos = g32 @ g16 / (np.linalg.norm(g32) * np.linalg.norm(g16) + 1e-12)
    assert cos > 0.9999, cos
    np.testing.assert_allclose(g16, g32, atol=2e-2, rtol=2e-2)


def test_coord_gradient_is_zero():
    rng = np.random.RandomState(4)
    vol = _rand(rng, 1, 3, 4, 5, 2)
    coords = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 20, 3)).astype(np.float32))
    g = jax.grad(lambda c: jnp.sum(grid_sample_3d_packed(vol, c)))(coords)
    np.testing.assert_allclose(np.asarray(g), 0.0)
