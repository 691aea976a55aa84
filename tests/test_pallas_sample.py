"""Pallas sampling-kernel parity tests (CPU interpret mode).

The kernel itself targets TPU; ``interpret=True`` (automatic off-TPU) runs
the same program through the Pallas interpreter, validating the one-hot
construction and both matmul directions against the gather reference.
"""
import numpy as np
import jax
import jax.numpy as jnp

from vfdepth_tpu.ops.grid_sample import grid_sample_2d
from vfdepth_tpu.ops.pallas_sample import sample_bilinear_pallas


def test_pallas_forward_matches_gather():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 8, 10, 7).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.3, 1.3, (2, 600, 2)).astype(np.float32))
    got = np.asarray(sample_bilinear_pallas(img, coords))
    want = np.asarray(grid_sample_2d(img, coords))
    # kernel matmuls run in bf16 -> ~1e-2 relative tolerance
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.02)


def test_pallas_nonfinite_coords_zero():
    img = jnp.ones((1, 8, 10, 3))
    coords = jnp.asarray([[[0.0, 0.0], [np.nan, 0.2], [2.5, 0.0]]], jnp.float32)
    out = np.asarray(sample_bilinear_pallas(img, coords))
    np.testing.assert_allclose(out[0, 0], 1.0, atol=0.02)
    np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-6)  # nan -> no taps
    np.testing.assert_allclose(out[0, 2], 0.0, atol=1e-6)  # oob -> no taps


def test_pallas_backward_matches_gather_vjp():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(1, 8, 10, 5).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.1, 1.1, (1, 300, 2)).astype(np.float32))

    def loss_pal(i):
        return jnp.sum(sample_bilinear_pallas(i, coords) ** 2)

    def loss_ref(i):
        return jnp.sum(grid_sample_2d(i, coords) ** 2)

    g_pal = np.asarray(jax.grad(loss_pal)(img))
    g_ref = np.asarray(jax.grad(loss_ref)(img))
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_pal, g_ref, atol=0.05 * scale, rtol=0.05)


def test_pallas_no_coord_gradient():
    """Coordinates are declared non-differentiable (zero gradient)."""
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 50, 2)).astype(np.float32))
    g = jax.grad(lambda c: jnp.sum(sample_bilinear_pallas(img, c)))(coords)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_pallas_masked_sampler_matches_separate_ops():
    """Fused feature+mask kernel == bilinear feature sample + separate
    NEAREST mask gather; the mask channel carries no gradient."""
    from vfdepth_tpu.ops.pallas_sample import (
        sample_bilinear_with_nearest_mask_pallas)

    rng = np.random.RandomState(3)
    b, h, w, c, n = 2, 48, 80, 16, 4096
    img = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, h, w, 1) > 0.4).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.3, 1.3, (b, n, 2)).astype(np.float32))

    fm = sample_bilinear_with_nearest_mask_pallas(img, mask, coords)
    assert fm.shape == (b, n, c + 1)
    feat_ref = sample_bilinear_pallas(img, coords)
    m_ref = grid_sample_2d(mask, coords, mode="nearest")[..., 0]
    np.testing.assert_allclose(np.asarray(fm[..., :-1]),
                               np.asarray(feat_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fm[..., -1]), np.asarray(m_ref),
                               atol=1e-6)

    # gradients: feature grads equal the unfused kernel's; mask grad zero
    def loss_fused(i, mk):
        return jnp.sum(sample_bilinear_with_nearest_mask_pallas(
            i, mk, coords)[..., :-1] ** 2)

    def loss_plain(i):
        return jnp.sum(sample_bilinear_pallas(i, coords) ** 2)

    gi, gm = jax.grad(loss_fused, argnums=(0, 1))(img, mask)
    gi_ref = jax.grad(loss_plain)(img)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gi_ref), atol=1e-5)
    assert float(jnp.max(jnp.abs(gm))) == 0.0


def test_backproject_fused_epilogue():
    """sample_backproject_pallas = ([feat * valid, rel * valid], valid) with
    valid = nearest mask > 0.5 — the kernel-side fold of the
    back-projection's per-point epilogue. Values and gradients must equal
    the unfused composition."""
    from vfdepth_tpu.ops.pallas_sample import sample_backproject_pallas

    rng = np.random.RandomState(7)
    b, h, w, c, n = 2, 32, 80, 8, 2000
    img = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, h, w, 1) > 0.3).astype(np.float32))
    coords = rng.uniform(-1.2, 1.2, (b, n, 2)).astype(np.float32)
    coords[:, -300:] = -3.0       # sanitized (invalid) points
    coords = jnp.asarray(coords)
    rel = jnp.asarray(rng.randn(b, n).astype(np.float32))

    out, valid_out = sample_backproject_pallas(img, mask, coords, rel)
    assert out.shape == (b, n, c + 1) and valid_out.shape == (b, n)
    feat_ref = sample_bilinear_pallas(img, coords)
    m_ref = grid_sample_2d(mask, coords, mode="nearest")[..., 0]
    valid_ref = (np.asarray(m_ref) > 0.5).astype(np.float32)
    np.testing.assert_allclose(np.asarray(valid_out), valid_ref, atol=0)
    np.testing.assert_allclose(
        np.asarray(out[..., :c]),
        np.asarray(feat_ref) * valid_ref[..., None], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out[..., c]),
        np.asarray(rel).astype(np.float32) * valid_ref, atol=1e-2)

    # image gradient: masked rows contribute nothing
    def loss_fused(i):
        return jnp.sum(sample_backproject_pallas(
            i, mask, coords, rel)[0][..., :c].astype(jnp.float32) ** 2)

    def loss_ref(i):
        s = sample_bilinear_pallas(i, coords)
        return jnp.sum((s * jnp.asarray(valid_ref)[..., None]) ** 2)

    gi = jax.grad(loss_fused)(img)
    gi_ref = jax.grad(loss_ref)(img)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gi_ref), atol=1e-4)


def test_pallas_backward_grid_channel_chunks():
    """C > 256 exercises the grid channel-chunk axis of the backward kernel
    (each chunk accumulates independently; results must equal a narrow-C
    reference run column-for-column)."""
    rng = np.random.RandomState(5)
    h, w, c, n = 16, 16, 320, 200
    img = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.1, 1.1, (1, n, 2)).astype(np.float32))
    gct = jnp.asarray(rng.randn(1, n, c).astype(np.float32))

    _, vjp = jax.vjp(lambda i: sample_bilinear_pallas(i, coords), img)
    (dimg,) = vjp(gct)
    # per-column reference: run the same VJP on 128-channel slices
    for o in range(0, c, 128):
        _, vjp_s = jax.vjp(
            lambda i: sample_bilinear_pallas(i, coords), img[..., o:o + 128])
        (dref,) = vjp_s(gct[..., o:o + 128])
        np.testing.assert_allclose(np.asarray(dimg[..., o:o + 128]),
                                   np.asarray(dref), atol=1e-4)
