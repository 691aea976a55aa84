"""Loss-landscape sanity: the photometric training loss, evaluated with the
ANALYTIC ground-truth pose and depth = alpha * GT, must be minimized at
alpha = 1 (strictly below over- and under-scaled depth). This is the
decisive end-to-end check that rendering + losses actually supervise depth
toward the geometric truth.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfdepth_tpu.data.synthetic_scene import SyntheticSceneDataset
from vfdepth_tpu.geometry.pose import relative_cam_poses
from vfdepth_tpu.geometry.view_rendering import render_views
from vfdepth_tpu.losses import LossConfig, total_loss

SPEED = 1.5


def _gt_pose(batch, frame_ids):
    exts = batch["extrinsics"]
    exts_inv = batch["extrinsics_inv"]
    mats = []
    for f in frame_ids[1:]:
        shift = jnp.eye(4).at[0, 3].set(-f * SPEED)
        mats.append(jnp.einsum("bcij,jk,bckl->bcil", exts_inv, shift, exts))
    return jnp.stack(mats, axis=2)


def _loss_at_alpha(batch, alpha, cfg, rel_cam):
    frame_ids = cfg.frame_ids
    gt = jnp.maximum(batch["depth"], 1.0)  # fill sky with far depth
    depth = jnp.where(batch["depth"] > 0, batch["depth"] * alpha, 60.0)
    cam_t = _gt_pose(batch, frame_ids)
    spatio, st = relative_cam_poses(batch["extrinsics"], batch["extrinsics_inv"],
                                    cam_t, rel_cam)
    colors = {f: batch[f"color/{f}/0"] for f in frame_ids}
    rendered = render_views(
        colors, batch["mask"], batch["K/0"], batch["inv_K/0"], depth,
        cam_t, spatio, st, rel_cam, frame_ids,
        do_intensity_align=True, spatio=True, spatio_temporal=True)
    disp = 1.0 / jnp.maximum(depth, 0.5)
    loss, logs = total_loss(jax.random.PRNGKey(0), cfg, batch,
                            {0: disp}, {0: depth}, cam_t, {0: rendered})
    return float(loss), {k: float(v) for k, v in logs.items()
                         if hasattr(v, "ndim") and v.ndim == 0}


@pytest.mark.slow
def test_loss_minimized_at_true_depth():
    ds = SyntheticSceneDataset(num_samples=1, num_cams=6, height=48, width=80,
                               speed=SPEED)
    batch = {k: jnp.asarray(v) for k, v in ds.batch([0]).items()}
    cfg = LossConfig(frame_ids=(0, -1, 1), scales=(0,))
    rel_cam = jnp.asarray(
        np.array([[1, 2], [0, 3], [0, 4], [1, 5], [2, 5], [3, 4]], np.int32))

    losses = {}
    for alpha in (0.25, 0.5, 1.0, 2.0, 4.0):
        losses[alpha], logs = _loss_at_alpha(batch, alpha, cfg, rel_cam)
    print("landscape:", losses)
    assert losses[1.0] < losses[0.5], f"GT not better than 0.5x: {losses}"
    assert losses[1.0] < losses[2.0], f"GT not better than 2x: {losses}"
    assert losses[1.0] < losses[0.25], losses
    assert losses[1.0] < losses[4.0], losses


@pytest.mark.slow
def test_reproj_term_minimized_at_true_depth():
    """The reprojection term alone (the dominant gradient source) must also
    prefer the true depth."""
    ds = SyntheticSceneDataset(num_samples=1, num_cams=6, height=48, width=80,
                               speed=SPEED)
    batch = {k: jnp.asarray(v) for k, v in ds.batch([0]).items()}
    cfg = LossConfig(frame_ids=(0, -1, 1), scales=(0,))
    rel_cam = jnp.asarray(
        np.array([[1, 2], [0, 3], [0, 4], [1, 5], [2, 5], [3, 4]], np.int32))
    vals = {}
    for alpha in (0.5, 1.0, 2.0):
        _, logs = _loss_at_alpha(batch, alpha, cfg, rel_cam)
        vals[alpha] = logs["reproj_loss"]
    print("reproj landscape:", vals)
    assert vals[1.0] < vals[0.5]
    assert vals[1.0] < vals[2.0]
