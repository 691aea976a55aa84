"""Projection / back-projection and pose-algebra tests."""
import numpy as np
import jax.numpy as jnp

from vfdepth_tpu.geometry import (
    backproject,
    reproject,
    project_coords,
    voxel_points_homo,
    frustum_world_points,
    distribute_pose,
    relative_cam_poses,
    vec_to_matrix,
    invert_pose,
)


def _intrinsics(fx, fy, cx, cy):
    k = np.eye(4, dtype=np.float32)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2] = fx, fy, cx, cy
    return k


def test_backproject_reproject_identity():
    """Identity transform must reproject each pixel onto itself."""
    h, w = 12, 16
    k = _intrinsics(20.0, 22.0, (w - 1) / 2, (h - 1) / 2)
    inv_k = np.linalg.inv(k).astype(np.float32)
    depth = jnp.full((1, h, w, 1), 5.0)
    coords = project_coords(depth, jnp.eye(4)[None], jnp.asarray(inv_k)[None], jnp.asarray(k)[None])
    coords = np.asarray(coords)[0]  # [h, w, 2] in [-1, 1]
    # expected: pixel i -> normalized 2*i/(size-1) - 1
    gx, gy = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    want_x = 2 * gx / (w - 1) - 1
    want_y = 2 * gy / (h - 1) - 1
    np.testing.assert_allclose(coords[..., 0], want_x, atol=1e-4)
    np.testing.assert_allclose(coords[..., 1], want_y, atol=1e-4)


def test_backproject_known_point():
    h, w = 4, 4
    k = _intrinsics(2.0, 2.0, 1.5, 1.5)
    inv_k = jnp.asarray(np.linalg.inv(k).astype(np.float32))
    depth = jnp.full((1, h, w, 1), 3.0)
    pts = np.asarray(backproject(inv_k[None], depth))[0]  # [4, h*w]
    # pixel (1.5, 1.5) is the principal point -> ray (0, 0, 1) * depth
    idx = 1 * w + 1  # pixel x=1,y=1 -> offset (-0.5)/2*3 = -0.75
    np.testing.assert_allclose(pts[:, idx], [-0.75, -0.75, 3.0, 1.0], atol=1e-5)
    assert pts.shape == (4, h * w)


def test_voxel_grid_layout():
    pts = np.asarray(voxel_points_homo([-50.0, -50.0, -15.0], [1.0, 1.0, 1.5], [100, 100, 20]))
    assert pts.shape == (4, 20 * 100 * 100)
    # first voxel: (x,y,z) = start point
    np.testing.assert_allclose(pts[:, 0], [-50.0, -50.0, -15.0, 1.0])
    # last voxel: end point = start + unit*(n-1)
    np.testing.assert_allclose(pts[:, -1], [49.0, 49.0, 13.5, 1.0])
    # z varies fastest (flattened y, x, z row-major — the internal order
    # that makes the frustum-sampler/BEV relabelings free reshapes)
    np.testing.assert_allclose(pts[:, 1], [-50.0, -50.0, -13.5, 1.0])
    np.testing.assert_allclose(pts[:, 20], [-49.0, -50.0, -15.0, 1.0])
    np.testing.assert_allclose(pts[:, 20 * 100], [-50.0, -49.0, -15.0, 1.0])


def test_frustum_points_identity_extrinsics():
    h, w = 2, 3
    k = _intrinsics(2.0, 2.0, 1.0, 0.5)
    inv_k = jnp.asarray(np.linalg.inv(k).astype(np.float32))
    bins = jnp.array([1.0, 4.0])
    pts = np.asarray(frustum_world_points(inv_k[None], jnp.eye(4)[None], h, w, bins))
    assert pts.shape == (1, 2, h * w, 3)
    # pixel (1, 0.5): ray through principal point -> (0, 0, 1); world = depth*(0,0,1)
    # pixel index x=1, y=0 is offset y by -0.5/2
    np.testing.assert_allclose(pts[0, 1, 1], [0.0, -1.0, 4.0], atol=1e-5)


def test_distribute_pose_reference_cam_unchanged():
    """Camera 0 (the canonical frame) must get exactly the canonical pose."""
    rng = np.random.RandomState(0)
    b, cams = 2, 6
    exts = np.stack([
        np.stack([np.asarray(vec_to_matrix(jnp.asarray(rng.randn(3) * 0.5),
                                           jnp.asarray(rng.randn(3)))) for _ in range(cams)])
        for _ in range(b)
    ]).astype(np.float32)
    exts_inv = np.linalg.inv(exts).astype(np.float32)
    canon = np.asarray(vec_to_matrix(jnp.asarray(rng.randn(b, 3) * 0.1),
                                     jnp.asarray(rng.randn(b, 3) * 0.2))).astype(np.float32)
    out = np.asarray(distribute_pose(jnp.asarray(canon), jnp.asarray(exts), jnp.asarray(exts_inv)))
    np.testing.assert_allclose(out[:, 0], canon, atol=1e-4)
    # every distributed pose is conjugate to the canonical one:
    for c in range(cams):
        want = exts_inv[:, c] @ exts[:, 0] @ canon @ exts_inv[:, 0] @ exts[:, c]
        np.testing.assert_allclose(out[:, c], want, atol=1e-4)


def test_relative_cam_poses():
    rng = np.random.RandomState(1)
    b, cams, n_ctx = 1, 6, 2
    exts = rng.randn(b, cams, 4, 4).astype(np.float32)
    # make them valid SE(3)
    exts = np.stack([[np.asarray(vec_to_matrix(jnp.asarray(rng.randn(3) * 0.3),
                                               jnp.asarray(rng.randn(3))))
                      for _ in range(cams)]]).astype(np.float32)
    exts_inv = np.linalg.inv(exts).astype(np.float32)
    cam_t = np.tile(np.eye(4, dtype=np.float32), (b, cams, n_ctx, 1, 1))
    cam_t[..., 0, 3] = 0.5  # translation x
    rel_cam = np.array([[1, 2], [0, 3], [0, 4], [1, 5], [2, 5], [3, 4]], dtype=np.int32)

    spatio, st = relative_cam_poses(jnp.asarray(exts), jnp.asarray(exts_inv),
                                    jnp.asarray(cam_t), jnp.asarray(rel_cam))
    spatio, st = np.asarray(spatio), np.asarray(st)
    assert spatio.shape == (b, cams, 2, 4, 4)
    assert st.shape == (b, cams, n_ctx, 2, 4, 4)
    # spatio pose for cam 0, neighbor 1: E_1^-1 @ E_0
    np.testing.assert_allclose(spatio[0, 0, 0], exts_inv[0, 1] @ exts[0, 0], atol=1e-4)
    # spatio-tempo = spatio @ cam_T
    np.testing.assert_allclose(st[0, 0, 1, 0], spatio[0, 0, 0] @ cam_t[0, 0, 1], atol=1e-4)


def test_invert_pose_matches_npinv():
    rng = np.random.RandomState(2)
    mats = np.asarray(vec_to_matrix(jnp.asarray(rng.randn(4, 3).astype(np.float32)),
                                    jnp.asarray(rng.randn(4, 3).astype(np.float32))))
    got = np.asarray(invert_pose(jnp.asarray(mats)))
    np.testing.assert_allclose(got, np.linalg.inv(mats), atol=1e-5)
