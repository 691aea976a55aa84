"""Top-level depth / pose networks (flax.linen, NHWC).

Re-designs of the reference's four networks (reference ``network/__init__.py:3-9``):
  * ``FusedDepthNet``  — surround-view fusion depth (fusion_depthnet.py:14-94)
  * ``FusedPoseNet``   — canonical motion from BEV   (fusion_posenet.py:12-72)
  * ``MonoDepthNet``   — Monodepth2 'fsm' baseline   (mono_depthnet.py)
  * ``MonoPoseNet``    — Monodepth2 pose baseline    (mono_posenet.py)

All of them consume/produce stacked camera-axis arrays; the camera dimension
is folded into batch only around the shared 2D conv encoders/decoders
(pack/unpack, reference blocks.py:6-31).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .blocks import ConvBlock, pack_cam_feat, unpack_cam_feat
from .resnet import ResnetEncoder, num_ch_enc
from .decoders import FusionDepthDecoder, MonoDepthDecoder, PoseDecoder
from .vfnet import VFNet
from ..ops.resize import resize_bilinear


class FusedDepthNet(nn.Module):
    """Packed 6-cam ResNet encoder -> level aggregation -> VFNet voxel
    round-trip -> fusion depth decoder -> sigmoid disparity.

    Feature aggregation (reference fusion_depthnet.py:58-66): encoder levels
    >= fusion_level are bilinearly upsampled (align_corners=True) to the
    fusion resolution, concatenated, and 1x1-conv-reduced to
    ``fusion_feat_in_dim`` channels.
    """
    num_layers: int = 18
    fusion_level: int = 2
    fusion_feat_in_dim: int = 256
    use_skips: bool = False
    scales: Sequence[int] = (0,)
    num_cams: int = 6
    height: int = 384
    width: int = 640
    voxel_str_p: Sequence[float] = (-50.0, -50.0, -15.0)
    voxel_unit_size: Sequence[float] = (1.0, 1.0, 1.5)
    voxel_size: Sequence[int] = (100, 100, 20)
    voxel_pre_dim: Sequence[int] = (64,)
    proj_d_bins: int = 50
    proj_d_str: float = 2.0
    proj_d_end: float = 50.0
    overlap_groups: Tuple[Sequence[int], Sequence[int]] = ((0, 3, 4), (1, 2, 5))
    dtype: Any = None
    sampler_2d: str = "auto"
    sampler_3d: str = "packed"

    def setup(self):
        lev = self.fusion_level
        self.encoder = ResnetEncoder(self.num_layers, 1, dtype=self.dtype,
                                     name="encoder")
        self.conv1x1 = ConvBlock(self.fusion_feat_in_dim, kernel_size=1,
                                 dtype=self.dtype, name="conv1x1")
        self.fusion_net = VFNet(
            feat_in_dim=self.fusion_feat_in_dim,
            feat_out_dim=num_ch_enc(self.num_layers)[lev],
            model="depth",
            voxel_str_p=self.voxel_str_p,
            voxel_unit_size=self.voxel_unit_size,
            voxel_size=self.voxel_size,
            voxel_pre_dim=self.voxel_pre_dim,
            proj_d_bins=self.proj_d_bins,
            proj_d_str=self.proj_d_str,
            proj_d_end=self.proj_d_end,
            num_cams=self.num_cams,
            fusion_level=lev,
            height=self.height,
            width=self.width,
            overlap_groups=self.overlap_groups,
            dtype=self.dtype,
            sampler_2d=self.sampler_2d,
            sampler_3d=self.sampler_3d,
            name="fusion_net",
        )
        self.decoder = FusionDepthDecoder(
            level_in=lev,
            num_ch_enc=num_ch_enc(self.num_layers)[: lev + 1],
            scales=tuple(self.scales),
            use_skips=self.use_skips,
            dtype=self.dtype,
            name="decoder",
        )

    def encode_aggregate(self, images: jnp.ndarray, train: bool):
        """Packed encoder pass + fusion-level feature aggregation."""
        b, cams = images.shape[:2]
        lev = self.fusion_level
        packed = pack_cam_feat(images)
        feats = self.encoder(packed, train)
        up_h, up_w = feats[lev].shape[-3], feats[lev].shape[-2]
        agg = [feats[lev]] + [
            resize_bilinear(f, (up_h, up_w), align_corners=True)
            for f in feats[lev + 1:]
        ]
        agg = jnp.concatenate(agg, axis=-1)
        agg = self.conv1x1(agg, train)
        return feats, unpack_cam_feat(agg, b, cams)

    def __call__(
        self,
        images: jnp.ndarray,          # [b, cams, H, W, 3] color_aug frame 0
        mask: jnp.ndarray,            # [b, cams, H, W, 1]
        intrinsics: jnp.ndarray,      # [b, cams, 4, 4] at fusion_level+1 scale
        inv_k: jnp.ndarray,           # [b, cams, 4, 4] at fusion_level+1 scale
        extrinsics: jnp.ndarray,
        extrinsics_inv: jnp.ndarray,
        extrinsics_aug: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        lev = self.fusion_level
        feats, feats_agg = self.encode_aggregate(images, train)
        if self.fusion_net.grouped_backprojection:
            feat, count = self.fusion_net.backproject_into_voxel_grouped(
                feats_agg, mask, intrinsics, extrinsics_inv)
            grouped = True
        else:
            feat, _, count = self.fusion_net.backproject_into_voxel(
                feats_agg, mask, intrinsics, extrinsics_inv)
            grouped = False
        return self.decode_from_backprojection(
            feat, count, [feats[i] for i in range(lev)], inv_k, extrinsics,
            extrinsics_aug=extrinsics_aug, train=train, grouped=grouped)

    def decode_from_backprojection(
        self,
        feat: jnp.ndarray,            # [b, cams, n_vox, C+1] (or [b, 2, ...]
                                      # group sums when grouped=True)
        count: jnp.ndarray,           # [b, n_vox]
        skip_feats: Sequence[jnp.ndarray],
        inv_k: jnp.ndarray,
        extrinsics: jnp.ndarray,
        extrinsics_aug: Optional[jnp.ndarray] = None,
        train: bool = True,
        grouped: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Voxel fusion + frustum reprojection + decoder, given the
        back-projected per-camera voxel features (possibly sampled through
        a kernel pass merged with the pose net's — the sampling carries no
        depth-net parameters)."""
        b, cams = inv_k.shape[:2]
        voxel_feat = self.fusion_net.fuse_depth(feat, count, grouped=grouped)
        proj = self.fusion_net.project_voxel_into_image(
            voxel_feat, inv_k, extrinsics, train)

        outputs: Dict[str, jnp.ndarray] = {}
        dec = self.decoder(list(skip_feats) + [pack_cam_feat(proj)])
        for k, v in dec.items():
            outputs[k] = unpack_cam_feat(v, b, cams)

        if extrinsics_aug is not None:
            proj_aug = self.fusion_net.project_voxel_into_image(
                voxel_feat, inv_k, extrinsics_aug, train)
            dec_aug = self.decoder(list(skip_feats) + [pack_cam_feat(proj_aug)])
            for k, v in dec_aug.items():
                outputs[f"{k}/aug"] = unpack_cam_feat(v, b, cams)
        return outputs

    def fuse_voxel(self, images: jnp.ndarray, mask: jnp.ndarray,
                   intrinsics: jnp.ndarray, extrinsics_inv: jnp.ndarray
                   ) -> jnp.ndarray:
        """Encoder + back-projection + fusion only -> voxel feature
        [b, n_voxels, C]. First half of the depth-synthesis sweep
        (reference ``volumetric_fusionnet.py:320-335``)."""
        _, feats_agg = self.encode_aggregate(images, train=False)
        if self.fusion_net.grouped_backprojection:
            feat, count = self.fusion_net.backproject_into_voxel_grouped(
                feats_agg, mask, intrinsics, extrinsics_inv)
            return self.fusion_net.fuse_depth(feat, count, grouped=True)
        feat, _, count = self.fusion_net.backproject_into_voxel(
            feats_agg, mask, intrinsics, extrinsics_inv)
        return self.fusion_net.fuse_depth(feat, count)

    def decode_view(self, voxel_feat: jnp.ndarray, inv_k_aug: jnp.ndarray,
                    rot: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
        """Decode camera-0 disparity at a novel rotated viewpoint.

        ``rot``: [3] axis-angle applied on top of the extrinsics (the
        reference's per-sweep-step transform, ``volumetric_fusionnet.py:321-328``).
        Returns [b, H', W', 1] disparity at the finest scale.
        """
        from ..geometry.se3 import axis_angle_to_matrix

        rot_mat = axis_angle_to_matrix(rot)
        tform = jnp.eye(4, dtype=extrinsics.dtype).at[:3, :3].set(rot_mat)
        ext_aug = tform @ extrinsics
        proj = self.fusion_net.project_voxel_into_image(
            voxel_feat, inv_k_aug, ext_aug, train=False)
        return self.decoder([proj[:, 0]])[f"disp/{min(self.scales)}"]


class FusedPoseNet(nn.Module):
    """Two stacked frames per camera -> encoder -> aggregation -> VFNet pose
    (BEV) -> PoseDecoder -> one canonical (axisangle, translation)."""
    num_layers: int = 18
    fusion_level: int = 2
    fusion_feat_in_dim: int = 256
    num_cams: int = 6
    height: int = 384
    width: int = 640
    voxel_str_p: Sequence[float] = (-50.0, -50.0, -15.0)
    voxel_unit_size: Sequence[float] = (1.0, 1.0, 1.5)
    voxel_size: Sequence[int] = (100, 100, 20)
    proj_d_bins: int = 50
    proj_d_str: float = 2.0
    proj_d_end: float = 50.0
    dtype: Any = None
    sampler_2d: str = "auto"
    sampler_3d: str = "packed"

    def setup(self):
        lev = self.fusion_level
        self.encoder = ResnetEncoder(self.num_layers, 2, dtype=self.dtype,
                                     name="encoder")
        self.conv1x1 = ConvBlock(self.fusion_feat_in_dim, kernel_size=1,
                                 dtype=self.dtype, name="conv1x1")
        self.fusion_net = VFNet(
            feat_in_dim=self.fusion_feat_in_dim,
            feat_out_dim=num_ch_enc(self.num_layers)[lev],
            model="pose",
            voxel_str_p=self.voxel_str_p,
            voxel_unit_size=self.voxel_unit_size,
            voxel_size=self.voxel_size,
            proj_d_bins=self.proj_d_bins,
            proj_d_str=self.proj_d_str,
            proj_d_end=self.proj_d_end,
            num_cams=self.num_cams,
            fusion_level=lev,
            height=self.height,
            width=self.width,
            dtype=self.dtype,
            sampler_2d=self.sampler_2d,
            sampler_3d=self.sampler_3d,
            name="fusion_net",
        )
        self.pose_decoder = PoseDecoder(
            num_frames_to_predict_for=1, stride=2, dtype=self.dtype,
            name="pose_decoder")

    def encode_aggregate(self, cur_images: jnp.ndarray,
                         next_images: jnp.ndarray, train: bool = True,
                         n_ctx: int = 1) -> jnp.ndarray:
        """Stacked-pair encoder + fusion-level aggregation.

        With ``n_ctx > 1`` the inputs stack context pairs group-major along
        batch ``[n_ctx*b, ...]``; the output merges them back into channel
        groups ``[b, cams, h, w, n_ctx*C]`` for the shared-coordinate
        back-projection."""
        gb, cams = cur_images.shape[:2]
        b = gb // n_ctx
        lev = self.fusion_level

        pair = jnp.concatenate([cur_images, next_images], axis=-1)  # 6 channels
        packed = pack_cam_feat(pair)
        feats = self.encoder(packed, train)

        up_h, up_w = feats[lev].shape[-3], feats[lev].shape[-2]
        agg = [feats[lev]] + [
            resize_bilinear(f, (up_h, up_w), align_corners=True) for f in feats[lev + 1:]
        ]
        agg = jnp.concatenate(agg, axis=-1)
        agg = self.conv1x1(agg, train)
        feats_agg = unpack_cam_feat(agg, gb, cams)
        if n_ctx > 1:
            # group-major batch -> channel groups for the shared-coordinate
            # back-projection: [G*b, cams, h, w, C] -> [b, cams, h, w, G*C]
            c = feats_agg.shape[-1]
            f = feats_agg.reshape((n_ctx, b) + feats_agg.shape[1:])
            f = jnp.moveaxis(f, 0, -2)
            feats_agg = f.reshape(f.shape[:-2] + (n_ctx * c,))
        return feats_agg

    def pose_from_backprojection(self, feat: jnp.ndarray, count: jnp.ndarray,
                                 train: bool = True, n_ctx: int = 1,
                                 grouped: bool = False
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Back-projected per-camera voxel features -> (axisangle,
        translation). ``feat``/``count`` as returned by
        ``vfnet.backproject_features`` on this net's aggregated features
        (possibly sampled through a kernel pass merged with the depth
        net's — the sampling itself carries no pose-net parameters).
        ``grouped``: feat is [b, 2, n, C+1] camera-group sums."""
        bev = self.fusion_net.pose_voxel_to_bev(feat, count, train=train,
                                                frame_groups=n_ctx,
                                                grouped=grouped)
        axisangle, translation = self.pose_decoder(bev)
        # translation clamp +-4.0 m (reference fusion_posenet.py:72)
        return axisangle, jnp.clip(translation, -4.0, 4.0)

    def __call__(
        self,
        cur_images: jnp.ndarray,      # [n_ctx*b, cams, H, W, 3]
        next_images: jnp.ndarray,     # [n_ctx*b, cams, H, W, 3]
        mask: jnp.ndarray,            # [b, ...] (NOT tiled over n_ctx)
        intrinsics: jnp.ndarray,
        inv_k: jnp.ndarray,
        extrinsics: jnp.ndarray,
        extrinsics_inv: jnp.ndarray,
        train: bool = True,
        n_ctx: int = 1,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """With ``n_ctx > 1``, the image args stack that many context pairs
        group-major along batch while mask/calibration stay at the true
        batch size: every pair shares the rig calibration, so the VFNet
        back-projection samples all pairs through one kernel pass
        (frame-group channel merge — see ``VFNet.__call__``). Outputs stay
        group-major ``[n_ctx*b, ...]``, identical to n_ctx separate calls."""
        feats_agg = self.encode_aggregate(cur_images, next_images,
                                          train=train, n_ctx=n_ctx)
        if self.fusion_net.grouped_backprojection:
            feat, count = self.fusion_net.backproject_into_voxel_grouped(
                feats_agg, mask, intrinsics, extrinsics_inv)
            return self.pose_from_backprojection(feat, count, train=train,
                                                 n_ctx=n_ctx, grouped=True)
        feat, _, count = self.fusion_net.backproject_into_voxel(
            feats_agg, mask, intrinsics, extrinsics_inv)
        return self.pose_from_backprojection(feat, count, train=train,
                                             n_ctx=n_ctx)


class MonoDepthNet(nn.Module):
    """Monodepth2-style per-camera depth ('fsm' baseline; reference
    mono_depthnet.py). Input is a packed [n, H, W, 3] image batch."""
    num_layers: int = 18
    scales: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        feats = ResnetEncoder(self.num_layers, 1, dtype=self.dtype,
                              name="encoder")(images, train)
        return MonoDepthDecoder(
            num_ch_enc=num_ch_enc(self.num_layers),
            scales=tuple(self.scales),
            dtype=self.dtype,
            name="decoder",
        )(feats)


class MonoPoseNet(nn.Module):
    """Monodepth2-style per-camera pose (reference mono_posenet.py):
    2 frames stacked on channels -> encoder -> pose decoder."""
    num_layers: int = 18
    dtype: Any = None

    @nn.compact
    def __call__(self, cur_images: jnp.ndarray, next_images: jnp.ndarray,
                 train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pair = jnp.concatenate([cur_images, next_images], axis=-1)
        feats = ResnetEncoder(self.num_layers, 2, dtype=self.dtype,
                              name="encoder")(pair, train)
        axisangle, translation = PoseDecoder(
            num_frames_to_predict_for=1, stride=1, dtype=self.dtype,
            name="pose_decoder")(feats[-1])
        return axisangle, jnp.clip(translation, -4.0, 4.0)
