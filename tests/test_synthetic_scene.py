"""Synthetic-scene geometric self-consistency tests.

These validate the renderer itself: warping frame t+1 into frame t using the
ANALYTIC depth and ego-motion must reproduce frame t almost exactly — the
end-to-end check that our projection/warp conventions (intrinsics,
extrinsics, pose distribution) are mutually consistent.
"""
import numpy as np
import jax.numpy as jnp

from vfdepth_tpu.data.synthetic_scene import SyntheticSceneDataset
from vfdepth_tpu.geometry.view_rendering import warp_image


def test_sample_contract_and_depth():
    ds = SyntheticSceneDataset(num_samples=2, num_cams=6, height=32, width=64)
    s = ds[0]
    assert s["color/0/0"].shape == (6, 32, 64, 3)
    assert s["depth"].shape == (6, 32, 64, 1)
    d = s["depth"]
    assert (d >= 0).all() and d.max() <= 80.0
    # ground visible in lower half of the forward camera, generally closer
    # at the bottom of the image
    front = d[0, :, 32, 0]
    vis = front > 0
    assert vis.sum() > 5
    rows = np.where(vis)[0]
    assert front[rows[-1]] < front[rows[0]] or front[rows[0]] == 0


def test_temporal_warp_consistency():
    """Warping frame +1 into frame 0 with GT depth/motion reproduces frame 0."""
    ds = SyntheticSceneDataset(num_samples=1, num_cams=6, height=48, width=80,
                               speed=0.4)
    s = ds[0]
    cam = 0  # forward camera
    tgt = jnp.asarray(s["color/0/0"][cam])[None]
    src = jnp.asarray(s["color/1/0"][cam])[None]
    depth = jnp.asarray(s["depth"][cam])[None]
    k = jnp.asarray(s["K/0"][cam])[None]
    inv_k = jnp.asarray(s["inv_K/0"][cam])[None]
    mask = jnp.ones_like(depth)

    # cam_T_cam for ego translating +x by `speed` between frames:
    # T = E_c^-1 . translate(-speed * x) . E_c (points move backward relative
    # to the ego when warping frame +1 back to frame 0)
    ext = s["extrinsics"][cam].astype(np.float64)
    shift = np.eye(4)
    shift[0, 3] = -0.4
    t_mat = np.linalg.inv(ext) @ shift @ ext
    warped, wmask = warp_image(src, mask, depth, inv_k, k,
                               jnp.asarray(t_mat.astype(np.float32))[None])
    warped, wmask = np.asarray(warped), np.asarray(wmask)
    valid = (wmask > 0) & (np.asarray(depth) > 0)
    # exclude the horizon band where depth -> max clamp
    valid &= np.asarray(depth) < 60.0
    assert valid.sum() > 200
    sel = np.repeat(valid, 3, -1)
    err = np.abs(warped - np.asarray(tgt))[sel].mean()
    err_raw = np.abs(np.asarray(src) - np.asarray(tgt))[sel].mean()
    # the mid-frequency texture leaves some bilinear resampling blur; the
    # geometric warp must still be far better than no warp
    assert err < 0.06, f"photometric error {err:.4f}"
    assert err < 0.6 * err_raw, f"warp ({err:.4f}) vs raw ({err_raw:.4f})"


def test_spatio_warp_consistency():
    """Warping a neighbor camera's image into the front camera with GT depth
    reproduces the front image in the overlap region."""
    ds = SyntheticSceneDataset(num_samples=1, num_cams=6, height=48, width=80)
    s = ds[0]
    cam, nbr = 0, 1
    tgt = jnp.asarray(s["color/0/0"][cam])[None]
    src = jnp.asarray(s["color/0/0"][nbr])[None]
    depth = jnp.asarray(s["depth"][cam])[None]
    k = jnp.asarray(s["K/0"])
    inv_k = jnp.asarray(s["inv_K/0"][cam])[None]
    mask = jnp.ones_like(depth)

    rel = np.linalg.inv(s["extrinsics"][nbr].astype(np.float64)) @ \
        s["extrinsics"][cam].astype(np.float64)
    warped, wmask = warp_image(src, mask, depth, inv_k, k[nbr][None],
                               jnp.asarray(rel.astype(np.float32))[None])
    warped, wmask = np.asarray(warped), np.asarray(wmask)
    valid = (wmask > 0) & (np.asarray(depth) > 0) & (np.asarray(depth) < 40.0)
    assert valid.sum() > 100, "no overlap region found"
    sel = np.repeat(valid, 3, -1)
    err = np.abs(warped - np.asarray(tgt))[sel].mean()
    # cross-camera resampling at oblique angles leaves some blur; the check
    # is discriminative: the geometric warp must beat the unwarped neighbor
    # image by a wide margin
    err_raw = np.abs(np.asarray(src) - np.asarray(tgt))[sel].mean()
    assert err < 0.1, f"photometric error {err:.4f}"
    assert err < 0.5 * err_raw, f"warp ({err:.4f}) not better than raw ({err_raw:.4f})"
