"""Pinhole projection / back-projection and grid construction (pure jnp).

Functional equivalents of the reference's ``Projection`` module and VFNet grid
builders (reference ``models/geometry/geometry_util.py:33-82``,
``network/volumetric_fusionnet.py:67-103``). Grids are built on the fly from
static shapes — under jit they become compile-time constants, so there is no
cached-buffer/device-placement bookkeeping.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def pixel_grid_homo(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid [3, H*W]: rows (x, y, 1) in pixel units."""
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")  # [H, W]
    ones = jnp.ones((height * width,), dtype=dtype)
    return jnp.stack([gx.reshape(-1), gy.reshape(-1), ones], axis=0)


def backproject(inv_k: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Back-project a depth map to homogeneous 3D camera points.

    Matches reference ``Projection.backproject`` (geometry_util.py:53-61).

    Args:
      inv_k: [..., 4, 4] (only the upper 3x3 is used).
      depth: [..., H, W, 1].
    Returns: [..., 4, H*W] homogeneous camera-frame points.
    """
    h, w = depth.shape[-3], depth.shape[-2]
    grid = pixel_grid_homo(h, w, depth.dtype)  # [3, H*W]
    rays = jnp.einsum("...ij,jn->...in", inv_k[..., :3, :3], grid)
    pts = rays * depth.reshape(depth.shape[:-3] + (1, h * w))
    ones = jnp.ones_like(pts[..., :1, :])
    return jnp.concatenate([pts, ones], axis=-2)


def reproject(k: jnp.ndarray, points3d: jnp.ndarray, transform: jnp.ndarray,
              height: int, width: int) -> jnp.ndarray:
    """Transform + project homogeneous 3D points to normalized sample coords.

    Matches reference ``Projection.reproject`` (geometry_util.py:63-78):
    P2d = (K @ T)[:3] @ P3d, perspective divide with +1e-7, normalized to
    [-1, 1] with align_corners=True convention.

    Args:
      k: [..., 4, 4]; transform: [..., 4, 4]; points3d: [..., 4, H*W].
    Returns: [..., H, W, 2] normalized (x, y).
    """
    proj = jnp.einsum("...ij,...jk->...ik", k, transform)[..., :3, :]
    pts2d = jnp.einsum("...ij,...jn->...in", proj, points3d)
    xy = pts2d[..., :2, :] / (pts2d[..., 2:3, :] + 1e-7)
    scale = jnp.array([2.0 / (width - 1), 2.0 / (height - 1)], dtype=xy.dtype)
    xy = xy * scale[..., :, None] - 1.0
    xy = jnp.moveaxis(xy, -2, -1)  # [..., H*W, 2]
    return xy.reshape(xy.shape[:-2] + (height, width, 2))


def project_coords(depth: jnp.ndarray, transform: jnp.ndarray, inv_k: jnp.ndarray,
                   k: jnp.ndarray) -> jnp.ndarray:
    """Full warp-coordinate computation (reference ``Projection.forward``)."""
    h, w = depth.shape[-3], depth.shape[-2]
    cam_points = backproject(inv_k, depth)
    return reproject(k, cam_points, transform, h, w)


def project_coords_window(depth_box: jnp.ndarray, origin: jnp.ndarray,
                          transform: jnp.ndarray, inv_k: jnp.ndarray,
                          k: jnp.ndarray, norm_h: int, norm_w: int) -> jnp.ndarray:
    """``project_coords`` for a window of the target image.

    Identical math to the dense version on the sub-rectangle of target
    pixels starting at ``origin`` (y0, x0): the pixel grid is offset by the
    (traced) origin and normalization uses the FULL source resolution.

    Args:
      depth_box: [..., Hb, Wb, 1] target depth window.
      origin: [..., 2] int (y0, x0), same leading dims as depth_box.
      transform/inv_k/k: [..., 4, 4].
    Returns: [..., Hb, Wb, 2] normalized sample coords into the full source.
    """
    hb, wb = depth_box.shape[-3], depth_box.shape[-2]
    dtype = depth_box.dtype
    grid = pixel_grid_homo(hb, wb, dtype)  # [3, Hb*Wb]
    off = jnp.stack([origin[..., 1], origin[..., 0],
                     jnp.zeros_like(origin[..., 0])], axis=-1).astype(dtype)
    grid_full = grid + off[..., :, None]   # [..., 3, P]
    rays = jnp.einsum("...ij,...jn->...in", inv_k[..., :3, :3], grid_full)
    pts = rays * depth_box.reshape(depth_box.shape[:-3] + (1, hb * wb))
    ones = jnp.ones_like(pts[..., :1, :])
    pts_h = jnp.concatenate([pts, ones], axis=-2)

    proj = jnp.einsum("...ij,...jk->...ik", k, transform)[..., :3, :]
    pts2d = jnp.einsum("...ij,...jn->...in", proj, pts_h)
    xy = pts2d[..., :2, :] / (pts2d[..., 2:3, :] + 1e-7)
    scale = jnp.array([2.0 / (norm_w - 1), 2.0 / (norm_h - 1)], dtype=xy.dtype)
    xy = xy * scale[..., :, None] - 1.0
    xy = jnp.moveaxis(xy, -2, -1)
    return xy.reshape(xy.shape[:-2] + (hb, wb, 2))


# ---------------------------------------------------------------------------
# Voxel-volume grids (VFNet)
# ---------------------------------------------------------------------------

def voxel_points_homo(voxel_str_p: Sequence[float], voxel_unit_size: Sequence[float],
                      voxel_size: Sequence[int], dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous world-frame voxel centers, [4, n_voxels] with n = y*x*z.

    Same voxel SET as reference ``create_voxel_grid``
    (volumetric_fusionnet.py:67-80) — world axes x fwd / y left / z up —
    but flattened in (y, x, z) index order (z fastest) instead of the
    reference's (z, y, x). The flat order is an internal convention (every
    consumer is order-agnostic per point); z-fastest makes BOTH hot
    relabelings free reshapes: the frustum sampler's oct rows want
    [y, x, z]-major rows (ops/sample3d_packed.py — the z-major order paid a
    26 MB transpose each way), and the pose path's z-into-channels BEV fold
    becomes ``reshape(b, vy, vx, vz*C)`` (the z-major order paid a 103M-
    element transpose, which round 3 needed a Pallas relayout kernel for).
    """
    vx, vy, vz = voxel_size
    ends = [voxel_str_p[i] + voxel_unit_size[i] * (voxel_size[i] - 1) for i in range(3)]
    gx = jnp.linspace(voxel_str_p[0], ends[0], vx, dtype=dtype)
    gy = jnp.linspace(voxel_str_p[1], ends[1], vy, dtype=dtype)
    gz = jnp.linspace(voxel_str_p[2], ends[2], vz, dtype=dtype)
    # broadcast to [y, x, z]
    yy = jnp.broadcast_to(gy[:, None, None], (vy, vx, vz))
    xx = jnp.broadcast_to(gx[None, :, None], (vy, vx, vz))
    zz = jnp.broadcast_to(gz[None, None, :], (vy, vx, vz))
    n = vz * vy * vx
    pts = jnp.stack([xx.reshape(n), yy.reshape(n), zz.reshape(n),
                     jnp.ones((n,), dtype=dtype)], axis=0)
    return pts


def frustum_world_points(inv_k: jnp.ndarray, extrinsics: jnp.ndarray,
                         img_h: int, img_w: int,
                         depth_bins: jnp.ndarray) -> jnp.ndarray:
    """Camera frustum points in world frame, per depth bin.

    Matches reference ``project_voxel_into_image`` point construction
    (volumetric_fusionnet.py:244-251): rays = invK @ pix, scaled by each depth
    bin, homogenized, then extrinsics (camera-to-world) applied.

    Args:
      inv_k: [..., 4, 4]; extrinsics: [..., 4, 4] camera-to-world.
      depth_bins: [n_bins].
    Returns: [..., n_bins, img_h * img_w, 3] world-frame xyz.
    """
    dtype = inv_k.dtype
    grid = pixel_grid_homo(img_h, img_w, dtype)  # [3, P]
    rays = jnp.einsum("...ij,jp->...ip", inv_k[..., :3, :3], grid)  # [..., 3, P]
    pts = rays[..., None, :, :] * depth_bins[:, None, None]  # [..., n_bins, 3, P]
    ones = jnp.ones_like(pts[..., :1, :])
    pts_h = jnp.concatenate([pts, ones], axis=-2)  # [..., n_bins, 4, P]
    world = jnp.einsum("...ij,...djp->...dip", extrinsics[..., :3, :], pts_h)
    return jnp.moveaxis(world, -2, -1)  # [..., n_bins, P, 3]
