"""Multi-camera pose algebra (functional, batched over the camera axis).

Equivalents of the reference ``Pose`` class (models/geometry/pose.py):
  * ``distribute_pose`` — canonical (vehicle-frame) motion to per-camera motion
    via extrinsics conjugation  T_c = E_c^-1 E_0 T E_0^-1 E_c  (pose.py:44-64)
  * ``relative_cam_poses`` — spatio (E_adj^-1 E_cam) and spatio-temporal
    ((E_adj^-1 E_cam) @ T_cam) pair transforms over the static camera
    adjacency (pose.py:66-97)

All functions operate on stacked arrays with an explicit camera axis instead
of per-camera dicts, so they vmap/shard cleanly.
"""
from __future__ import annotations

import jax.numpy as jnp


def distribute_pose(canon_t: jnp.ndarray, extrinsics: jnp.ndarray,
                    extrinsics_inv: jnp.ndarray) -> jnp.ndarray:
    """Distribute one canonical pose to every camera.

    Args:
      canon_t: [b, 4, 4] canonical motion (reference camera 0 frame).
      extrinsics: [b, cams, 4, 4] camera-to-world.
      extrinsics_inv: [b, cams, 4, 4].
    Returns: [b, cams, 4, 4] per-camera cam_T_cam.
    """
    ref_ext = extrinsics[:, 0]          # [b, 4, 4]
    ref_ext_inv = extrinsics_inv[:, 0]
    # E_c^-1 @ (E_0 @ T @ E_0^-1) @ E_c
    mid = jnp.einsum("bij,bjk,bkl->bil", ref_ext, canon_t, ref_ext_inv)
    return jnp.einsum("bcij,bjk,bckl->bcil", extrinsics_inv, mid, extrinsics)


def relative_cam_poses(extrinsics: jnp.ndarray, extrinsics_inv: jnp.ndarray,
                       cam_t_cam: jnp.ndarray, rel_cam: jnp.ndarray):
    """Spatio and spatio-temporal relative transforms for every camera pair.

    Args:
      extrinsics: [b, cams, 4, 4]; extrinsics_inv: [b, cams, 4, 4].
      cam_t_cam: [b, cams, n_ctx, 4, 4] per-camera temporal poses, one per
        context frame (frame_ids[1:] order).
      rel_cam: [cams, n_nbr] static neighbor indices (>= 0).
    Returns:
      spatio: [b, cams, n_nbr, 4, 4] — warp into neighbor view at t=0.
      spatio_tempo: [b, cams, n_ctx, n_nbr, 4, 4] — warp into neighbor at t+f.
    """
    nbr_ext_inv = extrinsics_inv[:, rel_cam]  # [b, cams, n_nbr, 4, 4]
    spatio = jnp.einsum("bcnij,bcjk->bcnik", nbr_ext_inv, extrinsics)
    # (E_adj^-1 E_cam) @ T_cam  — extrinsics assumed constant over time
    spatio_tempo = jnp.einsum("bcnij,bcfjk->bcfnik", spatio, cam_t_cam)
    return spatio, spatio_tempo
