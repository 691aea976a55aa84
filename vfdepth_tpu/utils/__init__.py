from .metrics import METRIC_NAMES, cal_depth_error, compute_depth_metrics, pretty_ts
from .visualize import colormap, aug_depth_params
from .logger import Logger

__all__ = [
    "METRIC_NAMES", "cal_depth_error", "compute_depth_metrics", "pretty_ts",
    "colormap", "aug_depth_params", "Logger",
]
