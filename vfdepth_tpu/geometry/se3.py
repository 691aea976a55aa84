"""SE(3) / SO(3) primitives (pure jnp, batched over leading dims).

Semantics match the reference's use of pytorch3d:
  * ``axis_angle_to_matrix`` — Rodrigues' formula, R = exp([a]_x)
    (reference ``models/geometry/geometry_util.py:8-30`` uses it inside
    ``vec_to_matrix``).
  * ``matrix_to_euler_angles`` with the "XYZ" convention (R = Rx @ Ry @ Rz),
    used only by the FSM pose-consistency loss
    (reference ``models/losses/multi_cam_loss.py:82-84``).
"""
from __future__ import annotations

import jax.numpy as jnp


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [v]_x for v of shape [..., 3] -> [..., 3, 3]."""
    zeros = jnp.zeros_like(v[..., 0])
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    rows = jnp.stack(
        [
            jnp.stack([zeros, -vz, vy], axis=-1),
            jnp.stack([vz, zeros, -vx], axis=-1),
            jnp.stack([-vy, vx, zeros], axis=-1),
        ],
        axis=-2,
    )
    return rows


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation matrix.

    Taylor-stable near theta=0:
      R = I + A [a]_x + B [a]_x^2,   A = sin(t)/t,  B = (1-cos(t))/t^2.
    """
    theta2 = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-30))
    small = theta2 < 1e-8
    a_coef = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b_coef = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-30))
    k = hat(axis_angle)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), k.shape)
    return eye + a_coef * k + b_coef * k2


def matrix_to_euler_angles_xyz(rot: jnp.ndarray) -> jnp.ndarray:
    """Inverse of R = Rx(ax) @ Ry(ay) @ Rz(az); returns [..., 3] = (ax, ay, az)."""
    ay = jnp.arcsin(jnp.clip(rot[..., 0, 2], -1.0, 1.0))
    az = jnp.arctan2(-rot[..., 0, 1], rot[..., 0, 0])
    ax = jnp.arctan2(-rot[..., 1, 2], rot[..., 2, 2])
    return jnp.stack([ax, ay, az], axis=-1)


def vec_to_matrix(rot_angle: jnp.ndarray, trans_vec: jnp.ndarray, invert: bool = False) -> jnp.ndarray:
    """Axis-angle + translation -> 4x4 SE(3) (reference geometry_util.py:8-30).

    ``invert=True`` builds the inverse transform directly (transpose R, negate
    t, reversed composition) — used for past-frame poses so the network always
    sees frames in temporal order.

    Args:
      rot_angle: [..., 3] axis-angle.
      trans_vec: [..., 3] translation.
    Returns: [..., 4, 4].
    """
    rot = axis_angle_to_matrix(rot_angle)
    t = trans_vec[..., None]  # [..., 3, 1]
    if invert:
        rot = jnp.swapaxes(rot, -1, -2)
        t = -t
        # P = R_mat @ T_mat  with T translating first
        top = jnp.concatenate([rot, rot @ t], axis=-1)
    else:
        # P = T_mat @ R_mat
        top = jnp.concatenate([rot, t], axis=-1)
    batch_shape = top.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), batch_shape + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_pose(mat: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of an SE(3) matrix [..., 4, 4] (cheaper + stabler than LU)."""
    rot = mat[..., :3, :3]
    t = mat[..., :3, 3:]
    rot_t = jnp.swapaxes(rot, -1, -2)
    top = jnp.concatenate([rot_t, -(rot_t @ t)], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=mat.dtype), mat.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
