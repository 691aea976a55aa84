from .resize import resize_bilinear, resize_nearest, upsample2x_nearest
from .grid_sample import grid_sample_2d, grid_sample_3d, grid_sample_3d_nocoordgrad

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "upsample2x_nearest",
    "grid_sample_2d",
    "grid_sample_3d",
    "grid_sample_3d_nocoordgrad",
]
