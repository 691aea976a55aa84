"""Quad-warp parity vs the gather sampler (values + coord gradients)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfdepth_tpu.ops.grid_sample import grid_sample_2d
from vfdepth_tpu.ops.warp_quad import warp_image_quad


def _setup(seed=0, b=2, h=9, w=11, c=3, n=400, lo=-1.4, hi=1.4):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    coords = jnp.asarray(rng.uniform(lo, hi, (b, n, 2)).astype(np.float32))
    return img, coords


def test_forward_matches_gather():
    img, coords = _setup()
    got = np.asarray(warp_image_quad(img, coords))
    want = np.asarray(grid_sample_2d(img, coords))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_forward_matches_gather_on_borders():
    """Coordinates straddling every border and corner."""
    img, _ = _setup(c=2)
    b, h, w = img.shape[0], img.shape[1], img.shape[2]
    edges = []
    for yy in (-1.0, -0.999, -0.5, 0.0, 0.999, 1.0, 1.05, -1.05):
        for xx in (-1.0, -0.98, 0.3, 0.98, 1.0, 1.2, -1.2):
            edges.append([xx, yy])
    coords = jnp.asarray(np.tile(np.asarray(edges, np.float32)[None], (b, 1, 1)))
    got = np.asarray(warp_image_quad(img, coords))
    want = np.asarray(grid_sample_2d(img, coords))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_nonfinite_coords():
    img, _ = _setup()
    coords = jnp.asarray([[[0.1, 0.1], [np.nan, 0.0], [np.inf, -np.inf]]],
                         jnp.float32)
    coords = jnp.tile(coords, (img.shape[0], 1, 1))
    got = np.asarray(warp_image_quad(img, coords))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[:, 1:], 0.0, atol=1e-6)


def test_coord_gradient_matches_autodiff():
    """Closed-form coord grads == autodiff through the gather sampler
    (interior points; border weight derivative is a.e. identical)."""
    img, coords = _setup(seed=3, lo=-0.9, hi=0.9)

    def loss_quad(cc):
        return jnp.sum(warp_image_quad(img, cc) ** 2)

    def loss_ref(cc):
        return jnp.sum(grid_sample_2d(img, cc) ** 2)

    g_quad = np.asarray(jax.grad(loss_quad)(coords))
    g_ref = np.asarray(jax.grad(loss_ref)(coords))
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_quad, g_ref, atol=1e-4 * scale, rtol=1e-4)


def test_image_gradient_is_zero_by_contract():
    img, coords = _setup(seed=4)
    g = jax.grad(lambda im: jnp.sum(warp_image_quad(im, coords)))(img)
    np.testing.assert_allclose(np.asarray(g), 0.0)
