"""Exact-conservative windows for the spatio / spatio-temporal warps.

The cross-camera overlap warps dominate the training step (~310 ms/step at
DDAD shapes on v5e: 36 of the 48 per-step warps; TPU gathers are row-count
bound, docs/PERF.md). But for a pair of rig cameras only a sub-rectangle of
the *target* image can ever receive a valid (or even nonzero /
nonzero-gradient) warp — the rest provably computes exact zeros in the dense
formulation. This module computes those rectangles so ``render_views`` can
warp only the window and paste it into a zero canvas, cutting gather rows by
the window/image area ratio with bit-identical loss semantics.

Why the bound is exact (not an approximation): a target pixel ray projected
into the source camera traces u(d) = (A + B d) / (C + D d) over depth d —
a Möbius function of d. Wherever the denominator (z_src + 1e-7, affine in d)
does not change sign on [d_lo, d_hi], u and v are monotone in d, so the
projected point stays inside the bounding box of its two depth-endpoint
projections. Pixels whose denominator CAN change sign (the projection pole)
get unbounded u and are included unconditionally. A 2-pixel dilation covers
the bilinear/nearest footprint AND the 1-pixel fringe where tap weights are
zero but their coordinate-derivatives are not, so excluded pixels have
exactly zero warped image, zero warped mask, and zero coordinate gradient in
the dense path (see ops/warp_quad._axis_weights).

Per-pair window *origins* are computed inside the step (they depend on the
batch extrinsics and the predicted egomotion — both traced); the window
*size* is static, estimated at setup time by ``estimate_window_hw`` on the
rig calibration over a worst-case motion set. A runtime ``overflow`` scalar
(logged) reports if an actual span ever exceeded the static size — it never
should with the default motion margin, but if it does, that step's windows
truncate and the flag makes it visible.

Depth endpoints are exact per target camera: the network depth is
``1/(1/max_d + (1/min_d - 1/max_d) * sigmoid)`` scaled by fx/300
(reference ``models/vfdepth.py:277-288``), hence guaranteed inside
[min_depth * fx / 300, max_depth * fx / 300].
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


class WarpWindows(NamedTuple):
    """Dynamic window origins (+ static sizes) for one rendered scale set.

    Each camera pair gets TWO windows ("slots"): slot 0 bounds the pixels
    whose projection is finite-bounded over the depth range (true overlap +
    behind-camera mirror projections — both monotone-bounded); slot 1 bounds
    the pixels whose projection pole (source z = 0) falls inside the depth
    range, whose projected coords are unbounded and must be warped verbatim.
    The two sets are usually disjoint column bands; separate rectangles
    bound them far tighter than one.

    The spatio windows depend only on the rig extrinsics (no egomotion), so
    their static sizes are exact for the rig; the spatio-temporal windows
    compose the predicted egomotion, so their sizes carry a motion bound
    (overflow-flagged at runtime). Either kind can be None = warp densely
    (used when its windows wouldn't shrink below ~full image).

    spatio_origin: [b, cams, n_nbr, 2, 2]        (slot, (y0, x0)) int32, or None
    st_origin:     [b, cams, n_ctx, n_nbr, 2, 2] or None
    spatio_hw/st_hw: static ((H0, W0), (H1, W1)) per slot, or None
    overflow:      [] float32 — max pixels any span exceeded its box (0 = ok)
    """
    spatio_origin: Optional[jnp.ndarray]
    st_origin: Optional[jnp.ndarray]
    spatio_hw: Optional[Tuple[Tuple[int, int], Tuple[int, int]]]
    st_hw: Optional[Tuple[Tuple[int, int], Tuple[int, int]]]
    overflow: jnp.ndarray


def _include_masks(rays, pose, src_k, d_lo, d_hi, h, w):
    """Per-pixel 'can this target pixel ever matter' tests.

    rays:  [..., 3, P] target-camera unit-depth rays (invK @ pixgrid)
    pose:  [..., 4, 4] target-cam -> source-cam
    src_k: [..., 4, 4] source intrinsics
    d_lo/d_hi: [...] per-target-camera depth endpoints (broadcast over P)
    Returns (near bool [..., P], pole bool [..., P]).
    """
    r = pose[..., :3, :3]
    t = pose[..., :3, 3]

    def endpoint(d):
        x = jnp.einsum("...ij,...jp->...ip", r, rays) * d[..., None, None] \
            + t[..., :, None]
        z = x[..., 2, :]
        denom = z + 1e-7
        kk = src_k
        u = (kk[..., 0, 0, None] * x[..., 0, :] + kk[..., 0, 2, None] * z) / denom
        v = (kk[..., 1, 1, None] * x[..., 1, :] + kk[..., 1, 2, None] * z) / denom
        return u, v, denom

    u0, v0, den0 = endpoint(d_lo)
    u1, v1, den1 = endpoint(d_hi)
    pole = (den0 * den1) <= 0  # projection pole inside the depth range
    u_min = jnp.minimum(u0, u1)
    u_max = jnp.maximum(u0, u1)
    v_min = jnp.minimum(v0, v1)
    v_max = jnp.maximum(v0, v1)
    near = ((u_max >= -2.0) & (u_min <= w + 1.0)
            & (v_max >= -2.0) & (v_min <= h + 1.0)) & ~pole
    return near, pole


def _bbox_origin(include, h, w, box_h, box_w):
    """include [..., H, W] -> (origin [..., 2] int32, span_h, span_w)."""
    big = jnp.int32(1 << 20)
    iy = jnp.arange(h, dtype=jnp.int32)
    ix = jnp.arange(w, dtype=jnp.int32)
    any_y = jnp.any(include, axis=-1)               # [..., H]
    any_x = jnp.any(include, axis=-2)               # [..., W]
    y_min = jnp.min(jnp.where(any_y, iy, big), axis=-1)
    y_max = jnp.max(jnp.where(any_y, iy, -1), axis=-1)
    x_min = jnp.min(jnp.where(any_x, ix, big), axis=-1)
    x_max = jnp.max(jnp.where(any_x, ix, -1), axis=-1)
    empty = y_max < 0
    span_h = jnp.where(empty, 0, y_max - jnp.minimum(y_min, y_max) + 1)
    span_w = jnp.where(empty, 0, x_max - jnp.minimum(x_min, x_max) + 1)
    y0 = jnp.clip(jnp.where(empty, 0, y_min), 0, max(h - box_h, 0))
    x0 = jnp.clip(jnp.where(empty, 0, x_min), 0, max(w - box_w, 0))
    return jnp.stack([y0, x0], axis=-1), span_h, span_w


def _st_actual_include(
    depth: jnp.ndarray,          # [b, cams, H, W, 1] ACTUAL predicted depth
    inv_k: jnp.ndarray,          # [b, cams, 4, 4]
    src_k: jnp.ndarray,          # [b, cams, n_nbr, 4, 4]
    st_pose: jnp.ndarray,        # [b, cams, n_ctx, n_nbr, 4, 4]
    h: int,
    w: int,
):
    """Per-pixel include masks for the spatio-temporal warps from the step's
    ACTUAL depth (slot 0: finite in-image-with-fringe; slot 1: non-finite
    coords, whose dense warp value is 2.0).

    Unlike ``_include_masks`` this needs no depth interval and no motion
    bound: the warped value/mask/coordinate-gradient at a target pixel
    depend only on its own projected coordinate at its own depth, and the
    coordinates are computed by the SAME ``project_coords`` the dense warp
    uses — a pixel outside both slots provably computes exact zeros (taps
    and their derivatives vanish beyond the 2-px fringe). The interval
    machinery stays for the spatio warps, whose no-motion bound is already
    exact-static; for ST it had to assume worst-case egomotion, which blows
    the boxes to the full image on real rigs (docs/PERF.md (c)).
    """
    from .projection import project_coords

    b, cams = depth.shape[:2]
    n_ctx, n_nbr = st_pose.shape[2], st_pose.shape[3]
    dep = jnp.broadcast_to(depth[:, :, None, None],
                           (b, cams, n_ctx, n_nbr) + depth.shape[2:])
    coords = project_coords(
        dep.astype(jnp.float32), st_pose.astype(jnp.float32),
        inv_k[:, :, None, None].astype(jnp.float32),
        src_k[:, :, None].astype(jnp.float32))  # [b,cams,ctx,nbr,H,W,2]
    fin = jnp.all(jnp.isfinite(coords), axis=-1)
    ex = 2.0 * 2.0 / (w - 1)     # 2-px tap fringe in normalized units
    ey = 2.0 * 2.0 / (h - 1)
    cx, cy = coords[..., 0], coords[..., 1]
    in_img = (fin & (cx >= -1.0 - ex) & (cx <= 1.0 + ex)
              & (cy >= -1.0 - ey) & (cy <= 1.0 + ey))
    return in_img, ~fin


def compute_windows(
    inv_k: jnp.ndarray,          # [b, cams, 4, 4] target intrinsics^-1 (scale 0)
    k: jnp.ndarray,              # [b, cams, 4, 4]
    spatio_pose: jnp.ndarray,    # [b, cams, n_nbr, 4, 4] target->source
    st_pose: jnp.ndarray,        # [b, cams, n_ctx, n_nbr, 4, 4]
    rel_idx: jnp.ndarray,        # [cams, n_nbr] source camera index (clamped)
    nbr_valid: jnp.ndarray,      # [cams, n_nbr] bool
    height: int,
    width: int,
    spatio_hw: Optional[Tuple[Tuple[int, int], Tuple[int, int]]],
    st_hw: Optional[Tuple[Tuple[int, int], Tuple[int, int]]],
    min_depth: float,
    max_depth: float,
    focal_length_scale: float,
    st_depth: Optional[jnp.ndarray] = None,  # actual depth -> per-step ST masks
) -> WarpWindows:
    """Windows for the spatio + spatio-temporal warps of one step.

    ``st_depth`` (the step's predicted depth, stop-gradient) switches the
    spatio-temporal include masks from the worst-case-motion interval
    analysis to the exact per-step masks of ``_st_actual_include`` — the
    static ``st_hw`` then only needs to bound TYPICAL spans (the runtime
    overflow flag + the trainer's dense fallback cover fast-motion
    excursions)."""
    geo = jnp.float32
    b, cams = inv_k.shape[:2]
    n_nbr = rel_idx.shape[1]
    n_ctx = st_pose.shape[2]

    from .projection import pixel_grid_homo
    grid = pixel_grid_homo(height, width, geo)  # [3, P]
    rays = jnp.einsum("bcij,jp->bcip", inv_k[..., :3, :3].astype(geo), grid)

    fx = k[..., 0, 0].astype(geo)               # [b, cams]
    d_lo = min_depth * fx / focal_length_scale
    d_hi = max_depth * fx / focal_length_scale

    src_k = k[:, rel_idx].astype(geo)           # [b, cams, n_nbr, 4, 4]

    def windows_for(pose, box_hw):  # pose [b, cams, n_nbr, 4, 4]
        near, pole = _include_masks(
            rays[:, :, None], pose.astype(geo), src_k,
            d_lo[:, :, None], d_hi[:, :, None], height, width)
        origins, spans = [], []
        for slot, inc in enumerate((near, pole)):
            inc = inc & nbr_valid[None, :, :, None]
            inc = inc.reshape(b, cams, n_nbr, height, width)
            o, sh, sw = _bbox_origin(inc, height, width,
                                     box_hw[slot][0], box_hw[slot][1])
            origins.append(o)
            spans.append((sh - box_hw[slot][0], sw - box_hw[slot][1]))
        return jnp.stack(origins, axis=-2), spans  # [..., 2(slot), 2]

    all_spans = []
    sp_origin = None
    if spatio_hw is not None:
        sp_origin, sp_spans = windows_for(spatio_pose, spatio_hw)
        all_spans.extend(sp_spans)
    st_origin = None
    if st_hw is not None and st_depth is not None:
        in_img, nonfin = _st_actual_include(
            st_depth, inv_k, src_k, st_pose, height, width)
        nv = nbr_valid[None, :, None, :, None, None]
        origins = []
        for slot, inc in enumerate((in_img & nv, nonfin & nv)):
            o, sh, sw = _bbox_origin(inc, height, width,
                                     st_hw[slot][0], st_hw[slot][1])
            origins.append(o)
            all_spans.append((sh - st_hw[slot][0], sw - st_hw[slot][1]))
        st_origin = jnp.stack(origins, axis=-2)  # [b,cams,ctx,nbr,2(slot),2]
    elif st_hw is not None:
        st_origins = []
        for f in range(n_ctx):
            o, spans = windows_for(st_pose[:, :, f], st_hw)
            st_origins.append(o)
            all_spans.extend(spans)
        st_origin = jnp.stack(st_origins, axis=2)

    if all_spans:
        overflow = jnp.maximum(
            jnp.max(jnp.stack([jnp.max(sh) for sh, _ in all_spans])),
            jnp.max(jnp.stack([jnp.max(sw) for _, sw in all_spans])),
        ).astype(jnp.float32)
        overflow = jnp.maximum(overflow, 0.0)
    else:
        overflow = jnp.zeros((), jnp.float32)
    return WarpWindows(sp_origin, st_origin, spatio_hw, st_hw, overflow)


# ---------------------------------------------------------------------------
# Setup-time static window sizing (host-side numpy)
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return min(int(-(-x // m) * m), 1 << 30)


def st_actual_hw(spatio_hw, height: int, width: int, pad_w: int = 64,
                 pad_h: int = 16):
    """Static box sizes for the actual-depth ST mode.

    Slot 0 (finite in-image) is the rig's no-motion interval near-slot
    widened by a motion-parallax pad: egomotion |t| at typical depth d
    shifts projections by ~fx*|t|/d (measured <= ~60 px at 1.5 m/frame on
    the nuScenes-geometry rig; the overflow flag + trainer dense fallback
    cover faster segments). The dominant parallax is horizontal (forward
    translation on a mostly-planar rig), but pitch/bumps and the radial
    component of forward flow shift projections VERTICALLY too, so the
    height gets its own smaller pad (``pad_h``, config
    ``tpu.st_window_pad_v``) rather than relying solely on the overflow
    fallback for row-direction excursions. Slot 1 (non-finite coords ->
    dense value 2.0) is a measure-zero set, minimally boxed."""
    (h0, w0), _ = spatio_hw
    slot0 = (min(_round_up(h0 + pad_h, 16), height),
             min(_round_up(w0 + pad_w, 64), width))
    slot1 = (min(16, height), min(64, width))
    return slot0, slot1


def estimate_window_hw(
    k: np.ndarray,               # [cams, 4, 4]
    inv_k: np.ndarray,           # [cams, 4, 4]
    extrinsics: np.ndarray,      # [cams, 4, 4] camera-to-world
    rel_idx: np.ndarray,         # [cams, n_nbr]
    nbr_valid: np.ndarray,       # [cams, n_nbr] bool
    height: int,
    width: int,
    min_depth: float,
    max_depth: float,
    focal_length_scale: float,
    max_trans: float = 4.0,      # reference clamps translation to +-4 m
    max_rot: float = 0.45,       # rad; generous bound on frame-to-frame ego rot
    margin: int = 32,
    with_motion: bool = True,
) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Static window size for a rig: max span over camera pairs and a
    worst-case egomotion set, padded and rounded. Runs in numpy at setup on a
    stride-4 pixel subgrid (the margin absorbs the stride error; the runtime
    overflow flag catches any residual undersizing).

    ``with_motion=False`` sizes for the *spatio* warps: the target->source
    pose is the fixed rig relative extrinsics (no egomotion composed), so
    the bound is exact for the rig and typically far tighter. Use
    ``with_motion=True`` for the spatio-temporal warps, which compose the
    predicted ``cam_T_cam`` (bounded by max_trans/max_rot).

    Returns (box_h, box_w), each capped at the full image size (a full-size
    window degrades gracefully to the dense warp).
    """
    import itertools

    stride = 4
    ext_inv = np.linalg.inv(extrinsics)
    grid_y, grid_x = np.mgrid[0:height:stride, 0:width:stride]
    pix = np.stack([grid_x.ravel(), grid_y.ravel(),
                    np.ones(grid_x.size)], 0).astype(np.float64)

    def axis_angle_mat(v):
        th = np.linalg.norm(v)
        if th < 1e-12:
            return np.eye(3)
        a = np.asarray(v) / th
        kx = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        return np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * (kx @ kx)

    # worst-case per-camera motions T (cam_T_cam): conjugated canonical
    # motions with extreme rotation/translation, plus identity
    motions = [np.eye(4)]
    if with_motion:
        for rv in itertools.product((-max_rot, 0.0, max_rot), repeat=3):
            for tv in ((0.0, 0.0, 0.0), (max_trans, 0, 0), (-max_trans, 0, 0),
                       (0, max_trans, 0), (0, -max_trans, 0),
                       (0, 0, max_trans), (0, 0, -max_trans)):
                m = np.eye(4)
                m[:3, :3] = axis_angle_mat(rv)
                m[:3, 3] = tv
                motions.append(m)

    best = [[1, 1], [1, 1]]  # per slot (near, pole): [h, w]
    for cam in range(k.shape[0]):
        fx = float(k[cam, 0, 0])
        d_lo = min_depth * fx / focal_length_scale
        d_hi = max_depth * fx / focal_length_scale
        rays = inv_k[cam, :3, :3].astype(np.float64) @ pix
        for j in range(rel_idx.shape[1]):
            if not nbr_valid[cam, j]:
                continue
            src = int(rel_idx[cam, j])
            rel = ext_inv[src] @ extrinsics[cam]  # spatio: target->source
            for m in motions:
                pose = rel @ m
                r, t = pose[:3, :3], pose[:3, 3]
                us, vs, dens = [], [], []
                for d in (d_lo, d_hi):
                    x = r @ rays * d + t[:, None]
                    den = x[2] + 1e-7
                    u = (k[src, 0, 0] * x[0] + k[src, 0, 2] * x[2]) / den
                    v = (k[src, 1, 1] * x[1] + k[src, 1, 2] * x[2]) / den
                    us.append(u)
                    vs.append(v)
                    dens.append(den)
                pole = dens[0] * dens[1] <= 0
                near = ((np.maximum(*us) >= -2) & (np.minimum(*us) <= width + 1)
                        & (np.maximum(*vs) >= -2) & (np.minimum(*vs) <= height + 1))
                for slot, inc in enumerate((near & ~pole, pole)):
                    if not inc.any():
                        continue
                    ys = grid_y.ravel()[inc]
                    xs = grid_x.ravel()[inc]
                    best[slot][0] = max(best[slot][0],
                                        int(ys.max() - ys.min() + 1) + stride)
                    best[slot][1] = max(best[slot][1],
                                        int(xs.max() - xs.min() + 1) + stride)

    out = []
    for slot in range(2):
        # 16-row alignment keeps the boxes patchable by the MXU warp
        # kernel's 16x16 micro-tiles (ops/warp_mxu.py); 64 columns is the
        # quad path's historical lane alignment (also a multiple of 16)
        box_h = min(_round_up(best[slot][0] + margin, 16), height)
        box_w = min(_round_up(best[slot][1] + margin, 64), width)
        out.append((box_h, box_w))
    return out[0], out[1]


def estimate_window_hw_multi(
    rigs: Sequence[Tuple[np.ndarray, np.ndarray]],  # [(K, extrinsics), ...]
    rel_idx: np.ndarray,
    nbr_valid: np.ndarray,
    height: int,
    width: int,
    min_depth: float,
    max_depth: float,
    focal_length_scale: float,
    with_motion: bool = True,
) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Static window size covering EVERY rig in ``rigs``: the elementwise
    max of ``estimate_window_hw`` over them. DDAD calibration varies per
    scene; windows must be sized for the dataset's spread, not one batch's
    rig, or scene A's boxes can truncate scene B's warps."""
    hw = None
    for k, ext in rigs:
        k = np.asarray(k, dtype=np.float64)
        one = estimate_window_hw(
            k, np.linalg.inv(k), np.asarray(ext), rel_idx, nbr_valid,
            height, width, min_depth, max_depth, focal_length_scale,
            with_motion=with_motion)
        hw = one if hw is None else tuple(
            (max(a[0], b[0]), max(a[1], b[1])) for a, b in zip(hw, one))
    return hw
