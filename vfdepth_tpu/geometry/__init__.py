from .se3 import (
    axis_angle_to_matrix,
    matrix_to_euler_angles_xyz,
    vec_to_matrix,
    invert_pose,
    hat,
)
from .projection import (
    pixel_grid_homo,
    backproject,
    reproject,
    project_coords,
    voxel_points_homo,
    frustum_world_points,
)
from .pose import distribute_pose, relative_cam_poses

__all__ = [
    "axis_angle_to_matrix",
    "matrix_to_euler_angles_xyz",
    "vec_to_matrix",
    "invert_pose",
    "hat",
    "pixel_grid_homo",
    "backproject",
    "reproject",
    "project_coords",
    "voxel_points_homo",
    "frustum_world_points",
    "distribute_pose",
    "relative_cam_poses",
]
