"""Mosaic-compiled kernel equivalence on REAL TPU hardware (VERDICT r2 #6).

The CPU suite asserts the Pallas kernels only in interpret mode, which does
not exercise lane/sublane layouts, `pl.when`/dynamic-trip lowering, or bf16
MXU rounding. Under ``VFDEPTH_TEST_TPU=1`` these tests compare the compiled
kernels against the XLA gather paths on the chip — values AND gradients.

Tolerances: the kernels compute taps/matmuls in bf16 against the gather
paths' f32, so values match to bf16 resolution (~3e-3 relative); coordinate
gradients compare looser (the MXU warp's closed-form d/dx maps accumulate
bf16 products).
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Mosaic kernel equivalence runs on TPU hardware only")


def _warp_inputs(seed=0, b=4, h=96, w=160):
    rng = np.random.RandomState(seed)
    img = rng.rand(b, h, w, 3).astype(np.float32)
    mask = (rng.rand(b, h, w, 1) > 0.2).astype(np.float32)
    n = h * w
    # mix of in-range, border, and far-out coords
    coords = rng.uniform(-1.4, 1.4, (b, n, 2)).astype(np.float32)
    coords[:, :64] = rng.uniform(-1.01, -0.99, (b, 64, 2))
    coords[:, 64:128] = -3.0
    return jnp.asarray(img), jnp.asarray(mask), jnp.asarray(coords)


@pytest.mark.slow
@pytest.mark.parametrize("layout", ["strip", "patch"])
def test_warp_mxu_matches_quad_on_tpu(layout):
    from vfdepth_tpu.ops.warp_mxu import warp_image_mask_mxu
    from vfdepth_tpu.ops.warp_quad import warp_image_mask_quad

    img, mask, coords = _warp_inputs()
    im_k, mm_k = jax.jit(
        lambda i, m, c: warp_image_mask_mxu(i, m, c, layout=layout))(
            img, mask, coords)
    im_g, mm_g = jax.jit(warp_image_mask_quad)(img, mask, coords)
    np.testing.assert_allclose(np.asarray(im_k), np.asarray(im_g),
                               atol=5e-3, rtol=0)
    # nearest mask is exact 0/1
    np.testing.assert_array_equal(np.asarray(mm_k), np.asarray(mm_g))

    # coordinate gradient (the only gradient these ops carry)
    def loss(op):
        def f(c):
            iw, mw = op(img, mask, c)
            return jnp.sum(iw.astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(f))(coords)

    g_k = loss(lambda i, m, c: warp_image_mask_mxu(i, m, c, layout=layout))
    g_g = loss(warp_image_mask_quad)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_g),
                               atol=3e-2, rtol=1e-2)


@pytest.mark.slow
def test_backprojection_sampler_matches_gather_on_tpu():
    from vfdepth_tpu.ops.pallas_sample import (
        sample_bilinear_with_nearest_mask_pallas)
    from vfdepth_tpu.ops.grid_sample import grid_sample_2d

    rng = np.random.RandomState(1)
    b, h, w, c, n = 6, 48, 80, 64, 50000
    img = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, h, w, 1) > 0.1).astype(np.float32))
    coords = rng.uniform(-1.3, 1.3, (b, n, 2)).astype(np.float32)
    coords[:, -256:] = -3.0  # dead sub-tiles exercise the zero-trip skip
    coords = jnp.asarray(coords)

    out = jax.jit(sample_bilinear_with_nearest_mask_pallas)(img, mask, coords)
    # gather reference: [b, 1, n, C] point layout
    ref = jax.jit(lambda i, cc: grid_sample_2d(
        i[:, None], cc[:, None], mode="bilinear"))(img, coords)[:, 0]
    ref_m = jax.jit(lambda m, cc: grid_sample_2d(
        m[:, None], cc[:, None], mode="nearest"))(mask, coords)[:, 0]
    np.testing.assert_allclose(np.asarray(out[..., :c]), np.asarray(ref),
                               atol=2e-2, rtol=0)
    np.testing.assert_array_equal(np.asarray(out[..., -1:]), np.asarray(ref_m))

    # image gradient: the Pallas backward is a transposed one-hot matmul,
    # the gather path scatters — both must produce the same dL/dimg
    def gk(i):
        return jnp.sum(sample_bilinear_with_nearest_mask_pallas(
            i, mask, coords).astype(jnp.float32) ** 2)

    def gg(i):
        s = grid_sample_2d(i[:, None], coords[:, None], mode="bilinear")[:, 0]
        m = grid_sample_2d(mask[:, None], coords[:, None],
                           mode="nearest")[:, 0]
        return jnp.sum(s.astype(jnp.float32) ** 2) + jnp.sum(m ** 2)

    d_k = jax.jit(jax.grad(gk))(img)
    d_g = jax.jit(jax.grad(gg))(img)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_g),
                               atol=0.5, rtol=2e-2)


@pytest.mark.slow
def test_sample3d_packed_matches_gather_on_tpu():
    from vfdepth_tpu.ops.sample3d_packed import grid_sample_3d_packed
    from vfdepth_tpu.ops.grid_sample import grid_sample_3d_nocoordgrad

    rng = np.random.RandomState(2)
    b, d, h, w, c = 1, 8, 24, 24, 16
    vol = jnp.asarray(rng.randn(b, d, h, w, c).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.2, 1.2, (b, 5000, 3)).astype(np.float32))

    out_p = jax.jit(grid_sample_3d_packed)(vol, coords)
    out_g = jax.jit(grid_sample_3d_nocoordgrad)(vol, coords)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_g),
                               atol=1e-4, rtol=1e-4)

    d_p = jax.jit(jax.grad(lambda v: jnp.sum(
        grid_sample_3d_packed(v, coords) ** 2)))(vol)
    d_g = jax.jit(jax.grad(lambda v: jnp.sum(
        grid_sample_3d_nocoordgrad(v, coords) ** 2)))(vol)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_g),
                               atol=1e-3, rtol=1e-3)
