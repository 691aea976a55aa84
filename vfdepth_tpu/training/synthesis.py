"""Novel-view depth-synthesis sweep driver (eval-time visualization).

Reference flow (``trainer/vfdepth_trainer.py:129-143`` +
``volumetric_fusionnet.py:320-335`` + ``fusion_depthnet.py:88-93``): at a
chosen eval batch, fuse the voxel volume once, then decode camera-0
disparity for ~788 scripted viewpoints (roll/pitch sweeps, focal morph,
360-degree yaw). Here the voxel fusion and the per-view decode are two
jitted applies — the decode compiles once and is reused across all views.
"""
from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..models.nets import FusedDepthNet
from ..utils.visualize import aug_depth_params


def synthesize_sweep(model, params, stats, batch, n_steps: int = 75,
                     max_views: int | None = None) -> List[np.ndarray]:
    """Returns a list of [b, H', W', 1] disparities, one per sweep view.

    ``max_views`` caps the sweep (testing / quick previews); None renders
    the full ~788-view scripted trajectory."""
    net = model.depth_net
    assert isinstance(net, FusedDepthNet), "sweep requires the fusion depth net"
    variables = {"params": params["depth_net"],
                 "batch_stats": stats["depth_net"]}
    lev = model.fusion_level
    k = np.asarray(batch[f"K/{lev + 1}"])

    fuse = jax.jit(lambda v, img, m, kk, ei: net.apply(
        v, img, m, kk, ei, method=FusedDepthNet.fuse_voxel))
    decode = jax.jit(lambda v, vf, ik, rot, ext: net.apply(
        v, vf, ik, rot, ext, method=FusedDepthNet.decode_view))

    voxel_feat = fuse(variables, batch["color_aug/0/0"], batch["mask"],
                      batch[f"K/{lev + 1}"], batch["extrinsics_inv"])

    disps = []
    params_list = aug_depth_params(k, n_steps)
    if max_views is not None:
        params_list = params_list[:max_views]
    for inv_k_aug, ax, ay, az in params_list:
        rot = jnp.asarray([ax, ay, az], dtype=jnp.float32)
        disp = decode(variables, voxel_feat, jnp.asarray(inv_k_aug, jnp.float32),
                      rot, batch["extrinsics"])
        disps.append(np.asarray(disp))
    return disps
