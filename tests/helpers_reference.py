"""Import the reference implementation (/root/reference, torch CPU) for
golden parity tests.

The reference's only hard deps beyond torch are
``pytorch3d.transforms.axis_angle_to_matrix`` / ``matrix_to_euler_angles``
(models/geometry/geometry_util.py:5, models/losses/multi_cam_loss.py:3),
``utils.aug_depth_params`` (network/volumetric_fusionnet.py:8, used only
when syn_visualize=True) and ``external.layers`` (packnet-sfm encoder /
decoders, import-time symbols only for the modules tested here). All three
are shimmed below, so the reference modules under test — ``VFNet``, the
fusion ``DepthDecoder``, ``vec_to_matrix``/``Projection``/``Pose``,
``ViewRendering``, the loss stack — execute their ORIGINAL code.

The reference packages are loaded under private aliases (``_refnet``,
``_refgeo``, ``_refloss``) via path-scoped ModuleSpecs so nothing on
/root/reference's root (train.py, utils/, models/) can shadow this repo's
modules.
"""
from __future__ import annotations

import importlib
import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import torch

REF_ROOT = "/root/reference"
_CACHE: dict = {}


# ---------------------------------------------------------------------------
# pytorch3d shims (torch re-implementations of the two functions used)
# ---------------------------------------------------------------------------
def _axis_angle_to_matrix(axis_angle: torch.Tensor) -> torch.Tensor:
    """Rodrigues' formula — semantics of pytorch3d.transforms
    ``axis_angle_to_matrix`` (exp of the hat map), Taylor-stable near 0."""
    theta2 = (axis_angle * axis_angle).sum(-1, keepdim=True).unsqueeze(-1)
    theta = torch.sqrt(torch.clamp(theta2, min=1e-30))
    small = theta2 < 1e-8
    a = torch.where(small, 1.0 - theta2 / 6.0, torch.sin(theta) / theta)
    b = torch.where(small, 0.5 - theta2 / 24.0,
                    (1.0 - torch.cos(theta)) / torch.clamp(theta2, min=1e-30))
    x, y, z = axis_angle[..., 0], axis_angle[..., 1], axis_angle[..., 2]
    zero = torch.zeros_like(x)
    k = torch.stack([
        torch.stack([zero, -z, y], dim=-1),
        torch.stack([z, zero, -x], dim=-1),
        torch.stack([-y, x, zero], dim=-1),
    ], dim=-2)
    eye = torch.eye(3, dtype=axis_angle.dtype).expand(k.shape)
    return eye + a * k + b * (k @ k)


def _matrix_to_euler_angles(matrix: torch.Tensor, convention: str) -> torch.Tensor:
    """Inverse of R = Rx @ Ry @ Rz (the only convention the reference uses,
    multi_cam_loss.py:82-84). Mirrors vfdepth_tpu.geometry.se3
    ``matrix_to_euler_angles_xyz``."""
    assert convention == "XYZ", convention
    ay = torch.asin(torch.clamp(matrix[..., 0, 2], -1.0, 1.0))
    az = torch.atan2(-matrix[..., 0, 1], matrix[..., 0, 0])
    ax = torch.atan2(-matrix[..., 1, 2], matrix[..., 2, 2])
    return torch.stack([ax, ay, az], dim=-1)


class _UnavailableExternal:
    """Stand-in for packnet-sfm classes: import-time symbol only."""

    def __init__(self, *a, **k):  # pragma: no cover
        raise RuntimeError("packnet-sfm externals are not vendored; the "
                           "parity tests exercise reference-owned code only")


def _register_shims() -> None:
    if "pytorch3d" not in sys.modules:
        p3d = types.ModuleType("pytorch3d")
        tr = types.ModuleType("pytorch3d.transforms")
        tr.axis_angle_to_matrix = _axis_angle_to_matrix
        tr.matrix_to_euler_angles = _matrix_to_euler_angles
        p3d.transforms = tr
        sys.modules["pytorch3d"] = p3d
        sys.modules["pytorch3d.transforms"] = tr
    if "external" not in sys.modules:
        ext = types.ModuleType("external")
        layers = types.ModuleType("external.layers")
        layers.ResnetEncoder = _UnavailableExternal
        layers.DepthDecoder = _UnavailableExternal
        layers.PoseDecoder = _UnavailableExternal
        ext.layers = layers
        sys.modules["external"] = ext
        sys.modules["external.layers"] = layers
    if "utils" not in sys.modules:
        # only `aug_depth_params` is imported at module scope
        # (volumetric_fusionnet.py:8); it executes only under syn_visualize
        u = types.ModuleType("utils")
        u.aug_depth_params = _UnavailableExternal
        sys.modules["utils"] = u


def _alias_pkg(alias: str, path: str) -> None:
    if alias in sys.modules:
        return
    spec = importlib.machinery.ModuleSpec(alias, None, is_package=True)
    mod = importlib.util.module_from_spec(spec)
    mod.__path__ = [path]
    sys.modules[alias] = mod


def load_reference():
    """Namespace of reference modules (cached)."""
    if "ns" in _CACHE:
        return _CACHE["ns"]
    _register_shims()
    _alias_pkg("_refnet", f"{REF_ROOT}/network")
    _alias_pkg("_refgeo", f"{REF_ROOT}/models/geometry")
    _alias_pkg("_refloss", f"{REF_ROOT}/models/losses")
    ns = types.SimpleNamespace(
        blocks=importlib.import_module("_refnet.blocks"),
        vfnet=importlib.import_module("_refnet.volumetric_fusionnet"),
        fusion_depthnet=importlib.import_module("_refnet.fusion_depthnet"),
        geometry_util=importlib.import_module("_refgeo.geometry_util"),
        pose=importlib.import_module("_refgeo.pose"),
        view_rendering=importlib.import_module("_refgeo.view_rendering"),
        loss_util=importlib.import_module("_refloss.loss_util"),
        single_cam_loss=importlib.import_module("_refloss.single_cam_loss"),
        multi_cam_loss=importlib.import_module("_refloss.multi_cam_loss"),
        depth_syn_loss=importlib.import_module("_refloss.depth_synthesis_loss"),
    )
    _CACHE["ns"] = ns
    return ns


# ---------------------------------------------------------------------------
# Shared fixtures: rig, reference config dict
# ---------------------------------------------------------------------------
def surround_rig(num_cams: int = 6, height: int = 64, width: int = 96,
                 radius: float = 1.5, cam_z: float = 1.4):
    """Synthetic 6-camera surround rig in the DDAD world frame (x fwd,
    y left, z up). Returns (K [cams,4,4], extrinsics cam-to-world [cams,4,4])
    as float32 numpy. Camera frame: z forward, x right, y down."""
    fx = fy = 0.55 * width
    k = np.zeros((num_cams, 4, 4), np.float32)
    ext = np.zeros((num_cams, 4, 4), np.float32)
    # base orientation: camera z -> world x, camera x -> world -y,
    # camera y -> world -z (columns are camera axes in world coords)
    base = np.array([[0.0, 0.0, 1.0],
                     [-1.0, 0.0, 0.0],
                     [0.0, -1.0, 0.0]], np.float32)
    for c in range(num_cams):
        k[c] = np.eye(4, dtype=np.float32)
        k[c, 0, 0], k[c, 1, 1] = fx, fy
        k[c, 0, 2], k[c, 1, 2] = width / 2.0, height / 2.0
        yaw = 2.0 * np.pi * c / num_cams
        cz, sz = np.cos(yaw), np.sin(yaw)
        rz = np.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]],
                      np.float32)
        ext[c] = np.eye(4, dtype=np.float32)
        ext[c, :3, :3] = rz @ base
        ext[c, :3, 3] = [radius * cz, radius * sz, cam_z]
    return k, ext


def ref_cfg(num_cams=6, height=64, width=96, batch_size=1,
            fusion_level=2, fusion_feat_in_dim=32,
            voxel_str_p=(-46.0, -46.0, -10.5), voxel_unit_size=(4.0, 4.0, 3.0),
            voxel_size=(24, 24, 8), voxel_pre_dim=(16,),
            proj_d_bins=12, proj_d_str=2.0, proj_d_end=50.0,
            scales=(0,), frame_ids=(0, -1, 1), rel_cam_list=None,
            spatio=True, spatio_temporal=True, intensity_align=True,
            aug_depth=False, syn_visualize=False, min_depth=1.5,
            max_depth=200.0, focal_length_scale=300.0, pose_model="fusion",
            disparity_smoothness=0.001, spatio_coeff=0.03,
            spatio_tempo_coeff=0.1, pose_loss_coeff=0.0):
    """Nested config dict in the reference's read_config shape
    (utils/misc.py:44-72 derived keys included inline)."""
    if rel_cam_list is None:
        rel_cam_list = {0: [1, 2], 1: [0, 3], 2: [0, 4], 3: [1, 5],
                        4: [2, 5], 5: [3, 4]}
    return {
        "model": {
            "fusion_level": fusion_level,
            "fusion_feat_in_dim": fusion_feat_in_dim,
            "voxel_str_p": list(voxel_str_p),
            "voxel_unit_size": list(voxel_unit_size),
            "voxel_size": list(voxel_size),
            "voxel_pre_dim": list(voxel_pre_dim),
            "proj_d_bins": proj_d_bins,
            "proj_d_str": proj_d_str,
            "proj_d_end": proj_d_end,
        },
        "data": {"num_cams": num_cams, "rel_cam_list": rel_cam_list},
        "training": {
            "height": height, "width": width, "batch_size": batch_size,
            "scales": list(scales), "frame_ids": list(frame_ids),
            "spatio": spatio, "spatio_temporal": spatio_temporal,
            "intensity_align": intensity_align, "aug_depth": aug_depth,
            "min_depth": min_depth, "max_depth": max_depth,
            "focal_length_scale": focal_length_scale,
            "pose_model": pose_model,
        },
        "loss": {
            "disparity_smoothness": disparity_smoothness,
            "spatio_coeff": spatio_coeff,
            "spatio_tempo_coeff": spatio_tempo_coeff,
            "pose_loss_coeff": pose_loss_coeff,
            # depth-synthesis coefficients (ddad_surround_fusion_augdepth.yaml:78-79)
            "depth_con_coeff": 0.03,
            "depth_sm_coeff": 0.05,
        },
        "eval": {"syn_visualize": syn_visualize},
    }


# ---------------------------------------------------------------------------
# torch -> flax weight transfer
# ---------------------------------------------------------------------------
def t2j_conv2d(w: torch.Tensor) -> np.ndarray:
    """torch Conv2d [O, I, kh, kw] -> flax HWIO [kh, kw, I, O]."""
    return np.ascontiguousarray(
        w.detach().numpy().transpose(2, 3, 1, 0))


def t2j_conv1d_as_dense(w: torch.Tensor) -> np.ndarray:
    """torch Conv1d k=1 [O, I, 1] -> flax Dense kernel [I, O]."""
    return np.ascontiguousarray(w.detach().numpy()[:, :, 0].T)


def _np(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy()


def map_vfnet_depth_params(ref_net, flax_params: dict, proj_d_bins: int,
                           pre_dim: int) -> dict:
    """Copy a reference depth-mode VFNet's weights into the flax VFNet tree.

    Channel-order notes:
      * conv_(non_)overlap: reference 1x1 conv1d == Dense (blocks.py:64-83).
      * reduce_dim[0]: the reference flattens the sampled frustum
        [b, C, D, h, w] -> channels (c*D + d) (volumetric_fusionnet.py:262);
        this repo reshapes [..., D, C] -> (d*C + c), so the input-channel
        axis is permuted accordingly (a pure relabeling of the same map).
    """
    p = {k: dict(v) for k, v in flax_params.items()}
    p["conv_non_overlap_0"] = {"Dense_0": {
        "kernel": t2j_conv1d_as_dense(ref_net.conv_non_overlap[0].weight),
        "bias": _np(ref_net.conv_non_overlap[0].bias)}}
    p["conv_overlap_0"] = {"Dense_0": {
        "kernel": t2j_conv1d_as_dense(ref_net.conv_overlap[0].weight),
        "bias": _np(ref_net.conv_overlap[0].bias)}}
    w0 = _np(ref_net.reduce_dim[0].weight)      # [256, pre*D, 3, 3], (c, d)
    o = w0.shape[0]
    w0 = w0.reshape(o, pre_dim, proj_d_bins, 3, 3).transpose(0, 2, 1, 3, 4)
    w0 = w0.reshape(o, proj_d_bins * pre_dim, 3, 3)  # (d, c) order
    p["reduce_dim_0"] = {"Conv_0": {
        "kernel": np.ascontiguousarray(w0.transpose(2, 3, 1, 0)),
        "bias": _np(ref_net.reduce_dim[0].bias)}}
    p["reduce_dim_1"] = {"Conv_0": {
        "kernel": t2j_conv2d(ref_net.reduce_dim[3].weight),
        "bias": _np(ref_net.reduce_dim[3].bias)}}
    return p


def map_vfnet_pose_params(ref_net, flax_params: dict, z_dim: int) -> dict:
    """Pose-mode VFNet weights. reduce_dim[0]'s input channels are the
    z-into-channels fold: reference (c*z + zi) with the rel-depth channel
    as feature index C-1 (volumetric_fusionnet.py:340); this repo's BEVFold
    splits the same conv into a feature kernel ((zi, c) z-major order) and
    a rel-depth partial kernel (channel partitioning of a conv is exact —
    models/vfnet.py BEVFold)."""
    p = {k: dict(v) for k, v in flax_params.items()}
    w0 = _np(ref_net.reduce_dim[0].weight)      # [256, C*z, 3, 3], (c, zi)
    o, cz = w0.shape[:2]
    c_in = cz // z_dim                          # = gc + 1 (rel last)
    gc = c_in - 1
    wr = w0.reshape(o, c_in, z_dim, 3, 3)
    w_feat = wr[:, :gc].transpose(0, 2, 1, 3, 4).reshape(o, z_dim * gc, 3, 3)
    w_rel = wr[:, gc]                           # [o, z, 3, 3]
    p["reduce_dim_0"] = {
        "kernel": np.ascontiguousarray(w_feat.transpose(2, 3, 1, 0)),
        "kernel_rel": np.ascontiguousarray(w_rel.transpose(2, 3, 1, 0)),
        "bias": _np(ref_net.reduce_dim[0].bias)}
    p["reduce_dim_1"] = {"Conv_0": {
        "kernel": t2j_conv2d(ref_net.reduce_dim[3].weight),
        "bias": _np(ref_net.reduce_dim[3].bias)}}
    return p


def map_fusion_decoder_params(ref_dec, flax_params: dict, level_in: int,
                              scales) -> dict:
    """Reference fusion DepthDecoder (fusion_depthnet.py:97-145) weights into
    this repo's FusionDepthDecoder tree (same conv graph, NHWC)."""
    p = dict(flax_params)
    for i in range(level_in, -1, -1):
        for j in (0, 1):
            conv = ref_dec.convs[("upconv", i, j)][0]
            p[f"upconv_{i}_{j}"] = {"Conv_0": {
                "kernel": t2j_conv2d(conv.weight), "bias": _np(conv.bias)}}
    for s in scales:
        conv = ref_dec.convs[("dispconv", s)][0]
        p[f"dispconv_{s}"] = {"Conv_0": {
            "kernel": t2j_conv2d(conv.weight), "bias": _np(conv.bias)}}
    return p
