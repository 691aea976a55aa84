from .blocks import ConvBlock, PointwiseBlock, pack_cam_feat, unpack_cam_feat
from .resnet import ResnetEncoder, num_ch_enc
from .decoders import FusionDepthDecoder, MonoDepthDecoder, PoseDecoder
from .vfnet import (VFNet, augment_extrinsics, backproject_features,
                    backproject_features_grouped, grouped_backprojection_ok)
from .nets import FusedDepthNet, FusedPoseNet, MonoDepthNet, MonoPoseNet

__all__ = [
    "ConvBlock", "PointwiseBlock", "pack_cam_feat", "unpack_cam_feat",
    "ResnetEncoder", "num_ch_enc",
    "FusionDepthDecoder", "MonoDepthDecoder", "PoseDecoder",
    "VFNet", "augment_extrinsics", "backproject_features",
    "backproject_features_grouped", "grouped_backprojection_ok",
    "FusedDepthNet", "FusedPoseNet", "MonoDepthNet", "MonoPoseNet",
]
