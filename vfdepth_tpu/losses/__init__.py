from .primitives import (
    ssim_loss,
    photometric_loss,
    edge_aware_smoothness,
    masked_mean,
    auto_mask,
    mean_normalized_disp,
)
from .composite import (
    LossConfig,
    reprojection_loss,
    smoothness_loss,
    spatio_loss_fn,
    spatio_tempo_loss_fn,
    pose_consistency_loss,
    depth_synthesis_loss,
    total_loss,
)

__all__ = [
    "ssim_loss", "photometric_loss", "edge_aware_smoothness", "masked_mean",
    "auto_mask", "mean_normalized_disp",
    "LossConfig", "reprojection_loss", "smoothness_loss", "spatio_loss_fn",
    "spatio_tempo_loss_fn", "pose_consistency_loss", "depth_synthesis_loss",
    "total_loss",
]
