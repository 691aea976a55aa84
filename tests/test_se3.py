"""SE(3)/SO(3) unit tests, incl. golden parity vs torch-computed Rodrigues."""
import numpy as np
import jax.numpy as jnp
import pytest

from vfdepth_tpu.geometry import (
    axis_angle_to_matrix,
    matrix_to_euler_angles_xyz,
    vec_to_matrix,
    invert_pose,
)


def _np_axis_angle_to_matrix(a):
    """Independent numpy Rodrigues for golden comparison."""
    theta = np.linalg.norm(a)
    if theta < 1e-12:
        return np.eye(3)
    k = a / theta
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * (kx @ kx)


def test_axis_angle_golden():
    rng = np.random.RandomState(0)
    vecs = rng.randn(16, 3).astype(np.float32)
    got = np.asarray(axis_angle_to_matrix(jnp.asarray(vecs)))
    for i in range(16):
        want = _np_axis_angle_to_matrix(vecs[i])
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_axis_angle_small_angle_stable():
    a = jnp.array([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]])
    rot = np.asarray(axis_angle_to_matrix(a))
    np.testing.assert_allclose(rot[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(rot[1], np.eye(3), atol=1e-7)


def test_rotation_orthonormal():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(8, 3).astype(np.float32))
    rot = np.asarray(axis_angle_to_matrix(a))
    eye = np.einsum("bij,bkj->bik", rot, rot)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(rot), np.ones(8), atol=1e-5)


def test_vec_to_matrix_roundtrip():
    """vec_to_matrix(invert=True) must be the inverse of vec_to_matrix(invert=False)."""
    rng = np.random.RandomState(2)
    rot = jnp.asarray(rng.randn(4, 3).astype(np.float32) * 0.3)
    t = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    fwd = np.asarray(vec_to_matrix(rot, t, invert=False))
    bwd = np.asarray(vec_to_matrix(rot, t, invert=True))
    prod = np.einsum("bij,bjk->bik", fwd, bwd)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (4, 1, 1)), atol=1e-5)


def test_vec_to_matrix_composition_order():
    """Forward: P = T_mat @ R_mat (translation applied after rotation)."""
    rot = jnp.array([[0.0, 0.0, np.pi / 2]])
    t = jnp.array([[1.0, 2.0, 3.0]])
    mat = np.asarray(vec_to_matrix(rot, t))
    # point (1,0,0) -> rotate 90deg about z -> (0,1,0) -> translate -> (1,3,3)
    p = mat @ np.array([1.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(p[0][:3], [1.0, 3.0, 3.0], atol=1e-5)


def test_invert_pose():
    rng = np.random.RandomState(3)
    rot = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    t = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    mat = vec_to_matrix(rot, t)
    inv = np.asarray(invert_pose(mat))
    prod = np.einsum("bij,bjk->bik", np.asarray(mat), inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (5, 1, 1)), atol=1e-5)


def test_euler_xyz_roundtrip():
    """matrix_to_euler_angles_xyz inverts Rx@Ry@Rz composition."""
    rng = np.random.RandomState(4)
    angles = rng.uniform(-1.2, 1.2, size=(8, 3)).astype(np.float32)

    def rx(a):
        return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])

    def ry(a):
        return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])

    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])

    mats = np.stack([rx(a[0]) @ ry(a[1]) @ rz(a[2]) for a in angles]).astype(np.float32)
    got = np.asarray(matrix_to_euler_angles_xyz(jnp.asarray(mats)))
    np.testing.assert_allclose(got, angles, atol=1e-4)


@pytest.mark.skipif(not pytest.importorskip("torch", reason="torch unavailable"),
                    reason="torch unavailable")
def test_axis_angle_vs_pytorch3d_convention():
    """Parity with the convention the reference relies on (pytorch3d axis_angle_to_matrix).

    pytorch3d isn't installed; its axis_angle_to_matrix is exp([a]_x) which the
    numpy golden already checks — here we additionally check against
    torch.linalg.matrix_exp of the hat matrix.
    """
    import torch

    rng = np.random.RandomState(5)
    vecs = rng.randn(6, 3).astype(np.float32)
    got = np.asarray(axis_angle_to_matrix(jnp.asarray(vecs)))
    for i in range(6):
        a = vecs[i]
        kx = torch.tensor([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        want = torch.linalg.matrix_exp(kx).numpy()
        np.testing.assert_allclose(got[i], want, atol=1e-5)
