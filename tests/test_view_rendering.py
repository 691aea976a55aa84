"""View-rendering warp correctness on synthetic geometry."""
import numpy as np
import jax.numpy as jnp

from vfdepth_tpu.geometry.view_rendering import warp_image, warp_depth, intensity_align


def _intrinsics(fx, fy, cx, cy):
    k = np.eye(4, dtype=np.float32)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2] = fx, fy, cx, cy
    return k


def test_identity_warp_reproduces_image():
    """Identity transform + any depth: target pixels sample themselves."""
    h, w = 16, 20
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    mask = jnp.ones((1, h, w, 1))
    k = _intrinsics(18.0, 18.0, (w - 1) / 2, (h - 1) / 2)
    inv_k = jnp.asarray(np.linalg.inv(k))[None]
    depth = jnp.full((1, h, w, 1), 7.0)

    warped, wmask = warp_image(img, mask, depth, inv_k, jnp.asarray(k)[None],
                               jnp.eye(4)[None])
    np.testing.assert_allclose(np.asarray(warped), np.asarray(img), atol=1e-4)
    np.testing.assert_allclose(np.asarray(wmask), 1.0, atol=1e-6)


def test_translated_warp_shifts_image():
    """Camera translated along +x: warped image shifts by fx*tx/z pixels."""
    h, w = 16, 24
    img = np.zeros((1, h, w, 3), dtype=np.float32)
    img[0, :, 10, :] = 1.0  # bright column at x=10
    mask = jnp.ones((1, h, w, 1))
    fx = 10.0
    k = _intrinsics(fx, fx, (w - 1) / 2, (h - 1) / 2)
    inv_k = jnp.asarray(np.linalg.inv(k))[None]
    depth_val = 5.0
    depth = jnp.full((1, h, w, 1), depth_val)

    tx = 1.0  # meters; pixel shift = fx * tx / z = 2 px
    transform = np.eye(4, dtype=np.float32)
    transform[0, 3] = tx
    warped, _ = warp_image(jnp.asarray(img), mask, depth, inv_k,
                           jnp.asarray(k)[None], jnp.asarray(transform)[None])
    warped = np.asarray(warped)
    # source column 10 should now appear at x = 10 - 2 = 8
    assert warped[0, 8, 8, 0] > 0.9, warped[0, 8, :, 0]
    assert warped[0, 8, 10, 0] < 0.1


def test_warp_depth_translation_along_z():
    """Pushing the camera toward the scene reduces observed depth by tz."""
    h, w = 12, 16
    k = _intrinsics(14.0, 14.0, (w - 1) / 2, (h - 1) / 2)
    inv_k = jnp.asarray(np.linalg.inv(k))[None]
    src_depth = jnp.full((1, h, w, 1), 10.0)
    tar_depth = jnp.full((1, h, w, 1), 9.0)
    mask = jnp.ones((1, h, w, 1))

    t = np.eye(4, dtype=np.float32)
    t[2, 3] = -1.0  # transform source points 1m closer
    depth_w, mask_w = warp_depth(src_depth, mask, inv_k, jnp.asarray(k)[None],
                                 tar_depth, inv_k, jnp.asarray(t)[None],
                                 min_depth=1.0, max_depth=100.0)
    # central region should read ~9.0
    c = np.asarray(depth_w)[0, h // 2, w // 2, 0]
    np.testing.assert_allclose(c, 9.0, atol=0.05)
    assert np.asarray(mask_w)[0, h // 2, w // 2, 0] == 1.0


def test_intensity_align_matches_stats():
    """Aligned warp has the reference's mean over the overlap region."""
    rng = np.random.RandomState(1)
    ref = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    warp = jnp.asarray((rng.rand(1, 8, 8, 3) * 0.5 + 0.5).astype(np.float32))
    mask = jnp.ones((1, 8, 8, 1))
    out = np.asarray(intensity_align(ref, mask, warp, mask))
    np.testing.assert_allclose(out.mean(), np.asarray(ref).mean(), atol=1e-2)


def test_intensity_align_no_overlap_passthrough():
    ref = jnp.ones((1, 8, 8, 3)) * 0.5
    warp = jnp.ones((1, 8, 8, 3)) * 0.9
    zero_mask = jnp.zeros((1, 8, 8, 1))
    out = np.asarray(intensity_align(ref, zero_mask, warp, zero_mask))
    np.testing.assert_allclose(out, 0.9, atol=1e-6)
