"""Differentiable view rendering — all cameras/neighbors warped at once.

TPU-first re-design of the reference ``ViewRendering``
(``models/geometry/view_rendering.py``): instead of a Python loop over
cameras and neighbor indices, the camera axis and the (static) neighbor
adjacency are array axes; every warp in the step is one batched
gather-sampler call. Semantics preserved:

  * ``warp_image``  == reference ``get_virtual_image`` (:61-82): bilinear image
    + nearest mask sampling at reprojected coords, NaN coords -> image 2.0 /
    mask 0, out-of-bounds invalidation of the mask.
  * intensity alignment == ``get_norm_image_single``/``get_mean_std`` (:30-59)
    with stats under stop_gradient; the reference's whole-batch skip when any
    sample lacks overlap becomes a per-sample ``where`` (branchless).
  * ``warp_depth``  == ``get_virtual_depth`` (:84-116): source depth
    transformed to target frame then backward-warped, range-clamped.
  * spatio / spatio-temporal overlap accumulation sums warped neighbor images
    ("assuming no overlap between warped images", :193-195).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .projection import backproject, project_coords, project_coords_window
from .se3 import invert_pose
from .warp_window import WarpWindows
from ..ops.grid_sample import grid_sample_2d


def warp_image(src_img: jnp.ndarray, src_mask: jnp.ndarray,
               tar_depth: jnp.ndarray, tar_inv_k: jnp.ndarray,
               src_k: jnp.ndarray, transform: jnp.ndarray,
               warp_op: str = "quad", mxu_layout: str = "strip",
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp source image/mask into the target view.

    All args carry matching leading batch dims; images are [..., H, W, C].
    Returns (warped_img, warped_mask) with mask already invalidated
    out-of-bounds.

    ``warp_op`` selects the sampler: 'quad' — ONE packed-footprint
    row-gather (``ops/warp_quad.py``, image channels bilinear, mask channel
    rounded weights = exact nearest); 'mxu' — the banded one-hot-matmul
    Pallas kernel (``ops/warp_mxu.py``, same tap semantics on the MXU,
    TPU-only). Photometric sources are inputs, so only coordinate gradients
    exist in either path.
    """
    from ..ops.warp_quad import warp_image_mask_quad
    from ..ops.warp_mxu import warp_image_mask_mxu

    coords = project_coords(tar_depth, transform, tar_inv_k, src_k)
    h, w, c = src_img.shape[-3], src_img.shape[-2], src_img.shape[-1]
    lead = src_img.shape[:-3]
    n_lead = int(np.prod(lead)) if lead else 1

    img_flat = src_img.reshape(n_lead, h, w, c)
    mask_flat = src_mask.reshape(n_lead, h, w, 1)
    coords_flat = coords.reshape(n_lead, -1, 2)
    if warp_op == "mxu":
        img_w, mask_w = warp_image_mask_mxu(img_flat, mask_flat, coords_flat,
                                            layout=mxu_layout)
    else:
        img_w, mask_w = warp_image_mask_quad(img_flat, mask_flat, coords_flat)
    img_w = img_w.reshape(lead + (h, w, c))
    mask_w = mask_w.reshape(lead + (h, w, 1))

    finite = jnp.all(jnp.isfinite(coords), axis=-1, keepdims=True)
    # NaN coords -> 2.0 (reference :74-78)
    img_w = jnp.where(finite, img_w, 2.0)
    mask_w = mask_w * finite.astype(mask_w.dtype)
    in_bounds = jnp.all((coords >= -1.0) & (coords <= 1.0), axis=-1,
                        keepdims=True).astype(src_img.dtype)
    return img_w, in_bounds * mask_w


def _slice_boxes(img: jnp.ndarray, origin: jnp.ndarray, box_h: int,
                 box_w: int) -> jnp.ndarray:
    """Per-element dynamic windows: img [*lead, H, W, C], origin [*lead, 2]
    -> [*lead, box_h, box_w, C]."""
    lead = img.shape[:-3]
    c = img.shape[-1]
    img_flat = img.reshape((-1,) + img.shape[-3:])
    org_flat = origin.reshape(-1, 2)

    def one(im, org):
        return jax.lax.dynamic_slice(im, (org[0], org[1], 0),
                                     (box_h, box_w, c))

    out = jax.vmap(one)(img_flat, org_flat)
    return out.reshape(lead + (box_h, box_w, c))


def _paste_boxes(canvas: jnp.ndarray, boxes: jnp.ndarray,
                 origin: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _slice_boxes: overwrite each window of ``canvas``
    [*lead, H, W, C] with boxes [*lead, Hb, Wb, C] at origin [*lead, 2]."""
    lead = boxes.shape[:-3]
    canvas_flat = canvas.reshape((-1,) + canvas.shape[-3:])
    boxes_flat = boxes.reshape((-1,) + boxes.shape[-3:])
    org_flat = origin.reshape(-1, 2)

    def one(cv, box, org):
        return jax.lax.dynamic_update_slice(cv, box, (org[0], org[1], 0))

    out = jax.vmap(one)(canvas_flat, boxes_flat, org_flat)
    return out.reshape(canvas.shape)


def warp_image_window(src_img: jnp.ndarray, src_mask: jnp.ndarray,
                      tar_depth: jnp.ndarray, tar_inv_k: jnp.ndarray,
                      src_k: jnp.ndarray, transform: jnp.ndarray,
                      origin: jnp.ndarray,
                      box_hw: Tuple[Tuple[int, int], Tuple[int, int]],
                      warp_op: str = "quad",
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``warp_image`` restricted to per-element target windows, pasted back
    into a zero canvas.

    ``origin`` is [*lead, n_slot, 2]: each camera pair gets one window per
    slot (near / pole, see geometry/warp_window.py) with static per-slot
    sizes ``box_hw[slot]``. Windows may overlap; every window computes the
    exact dense value for every pixel it covers, so later pastes
    overwriting earlier ones are idempotent.

    Exact-equal to the dense warp when the windows jointly cover every
    target pixel with a nonzero warped value, mask, or coordinate gradient —
    which ``compute_windows`` guarantees by construction. Cuts warp gather
    rows by the window/image area ratio (the dominant per-step cost at DDAD
    shapes; docs/PERF.md).
    """
    from ..ops.warp_quad import warp_image_mask_quad
    from ..ops.warp_mxu import warp_image_mask_mxu

    h, w, c = src_img.shape[-3], src_img.shape[-2], src_img.shape[-1]
    lead = src_img.shape[:-3]
    n_lead = int(np.prod(lead)) if lead else 1
    img_flat = src_img.reshape(n_lead, h, w, c)
    mask_flat = src_mask.reshape(n_lead, h, w, 1)

    img_w = jnp.zeros(lead + (h, w, c), src_img.dtype)
    mask_w = jnp.zeros(lead + (h, w, 1), src_img.dtype)
    for slot in range(origin.shape[-2]):
        box_h, box_w = box_hw[slot]
        org = origin[..., slot, :]
        dep_box = _slice_boxes(tar_depth, org, box_h, box_w)
        coords = project_coords_window(dep_box, org, transform, tar_inv_k,
                                       src_k, h, w)
        coords_flat = coords.reshape(n_lead, -1, 2)
        if warp_op == "mxu":
            # patch micro-tiles when the box is 16-aligned (estimate_window_hw
            # rounds to (16, 64)), else strips; either way the kernel only
            # processes the box's pixels
            layout = ("patch" if box_h % 16 == 0 and box_w % 16 == 0
                      else "strip")
            img_b, mask_b = warp_image_mask_mxu(
                img_flat, mask_flat, coords_flat, layout=layout,
                coords_hw=(box_h, box_w))
        else:
            img_b, mask_b = warp_image_mask_quad(img_flat, mask_flat,
                                                 coords_flat)
        img_b = img_b.reshape(lead + (box_h, box_w, c))
        mask_b = mask_b.reshape(lead + (box_h, box_w, 1))

        finite = jnp.all(jnp.isfinite(coords), axis=-1, keepdims=True)
        img_b = jnp.where(finite, img_b, 2.0)
        mask_b = mask_b * finite.astype(mask_b.dtype)
        in_bounds = jnp.all((coords >= -1.0) & (coords <= 1.0), axis=-1,
                            keepdims=True).astype(src_img.dtype)
        mask_b = in_bounds * mask_b

        img_w = _paste_boxes(img_w, img_b, org)
        mask_w = _paste_boxes(mask_w, mask_b, org)
    return img_w, mask_w


def warp_depth(src_depth: jnp.ndarray, src_mask: jnp.ndarray,
               src_inv_k: jnp.ndarray, src_k: jnp.ndarray,
               tar_depth: jnp.ndarray, tar_inv_k: jnp.ndarray,
               transform: jnp.ndarray, min_depth: float, max_depth: float
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backward-warp source *depth* into the target coordinate frame.

    Matches reference ``get_virtual_depth`` (:84-116): the source depth map is
    first expressed in the target frame (z of the transformed source points),
    then that map is sampled at coords projected with T^-1, and clamped to
    [min_depth, max_depth] with validity tracked.
    """
    h, w = src_depth.shape[-3], src_depth.shape[-2]
    src_points = backproject(src_inv_k, src_depth)            # [..., 4, HW]
    warped_pts = jnp.einsum("...ij,...jn->...in", transform[..., :3, :], src_points)
    src_depth_t = warped_pts[..., 2, :].reshape(src_depth.shape[:-3] + (h, w, 1))

    coords = project_coords(tar_depth, invert_pose(transform), tar_inv_k, src_k)
    depth_w, finite = grid_sample_2d(src_depth_t, coords, mode="bilinear",
                                     with_finite_mask=True)
    depth_w = jnp.where(finite > 0, depth_w, 2.0)
    mask_w = grid_sample_2d(src_mask, coords, mode="nearest") * finite
    in_bounds = jnp.all((coords >= -1.0) & (coords <= 1.0), axis=-1,
                        keepdims=True).astype(src_depth.dtype)

    valid_min = (depth_w > min_depth).astype(src_depth.dtype)
    valid_max = (depth_w < max_depth).astype(src_depth.dtype)
    depth_w = jnp.clip(depth_w, min_depth, max_depth)
    return depth_w, in_bounds * mask_w * valid_min * valid_max


def intensity_align(ref_img: jnp.ndarray, ref_mask: jnp.ndarray,
                    warp_img: jnp.ndarray, warp_mask: jnp.ndarray) -> jnp.ndarray:
    """Renormalize the warped image to the reference's overlap statistics.

    Stats (stop-gradient) over mask = ref_mask * warp_mask, broadcast to RGB;
    the reference's variance uses the *full* pixel count as denominator
    (view_rendering.py:34-36) — preserved. Where a sample has an empty
    overlap the warped image passes through unchanged.
    """
    mask = jax.lax.stop_gradient(
        (ref_mask * jax.lax.stop_gradient(warp_mask)) > 0).astype(jnp.float32)
    ch = warp_img.shape[-1]
    denom_full = float(warp_img.shape[-3] * warp_img.shape[-2] * ch)
    # the overlap mask broadcasts over RGB, so its 3-channel sum is ch * sum
    msum = ch * jnp.sum(mask, axis=(-3, -2, -1), keepdims=True)

    def stats(img):
        # f32 accumulation regardless of image dtype (bf16 under mixed
        # precision): the moment identity cancels catastrophically below
        # f32; the upcast fuses into the read, costing no extra HBM pass
        img = img.astype(jnp.float32)
        # ONE pass per image: the three reductions (masked sum, full sum,
        # full square-sum) fuse into a single read of the stream; the
        # sequential mean-then-squared-deviation form re-streamed each
        # [cams, H, W, 3] image twice. Full-count quirk: the reference
        # takes the squared deviation over ALL pixels around the MASKED
        # mean and divides by the full count (view_rendering.py:34-36) —
        # expressed here through the moment identity
        # sum((x - m)^2) = sum(x^2) - 2 m sum(x) + N m^2.
        s1m = jnp.sum(img * mask, axis=(-3, -2, -1), keepdims=True)
        s1 = jnp.sum(img, axis=(-3, -2, -1), keepdims=True)
        s2 = jnp.sum(img * img, axis=(-3, -2, -1), keepdims=True)
        mean = s1m / (msum + 1e-8)
        var = (s2 - 2.0 * mean * s1 + denom_full * mean * mean) / denom_full
        return mean, jnp.sqrt(jnp.maximum(var, 0.0) + 1e-16)

    s_mean, s_std = jax.tree_util.tree_map(jax.lax.stop_gradient, stats(ref_img))
    w_mean, w_std = jax.tree_util.tree_map(jax.lax.stop_gradient, stats(warp_img))
    norm = (warp_img - w_mean) / (w_std + 1e-8) * s_std + s_mean
    norm = norm * warp_mask

    # back to the image's own dtype (bf16 under mixed precision): the
    # normalization arithmetic ran f32 via broadcasting; storing f32 would
    # double the overlap stack's traffic again
    return jnp.where(msum > 0, norm, warp_img).astype(warp_img.dtype)


class RenderOutputs(NamedTuple):
    """All warped tensors for one scale, camera axis explicit.

    temporal_img / temporal_mask: [b, cams, n_ctx, H, W, C|1]
    overlap_img / overlap_mask:   [b, cams, n_frames(=1+n_ctx), H, W, C|1]
      index 0 is frame 0 (spatio), 1.. are the context frames (spatio-temporal)
    tform_depth / tform_depth_mask: [b, cams, n_nbr+1, H, W, 1] or None
    """
    temporal_img: jnp.ndarray
    temporal_mask: jnp.ndarray
    overlap_img: Optional[jnp.ndarray]
    overlap_mask: Optional[jnp.ndarray]
    tform_depth: Optional[jnp.ndarray]
    tform_depth_mask: Optional[jnp.ndarray]


def render_views(
    colors: Dict[int, jnp.ndarray],   # frame_id -> [b, cams, H, W, 3] (scale 0)
    mask: jnp.ndarray,                # [b, cams, H, W, 1]
    k: jnp.ndarray,                   # [b, cams, 4, 4] scale 0
    inv_k: jnp.ndarray,               # [b, cams, 4, 4]
    depth: jnp.ndarray,               # [b, cams, H, W, 1]
    cam_t_cam: jnp.ndarray,           # [b, cams, n_ctx, 4, 4]
    spatio_pose: Optional[jnp.ndarray],        # [b, cams, n_nbr, 4, 4]
    spatio_tempo_pose: Optional[jnp.ndarray],  # [b, cams, n_ctx, n_nbr, 4, 4]
    rel_cam: jnp.ndarray,             # [cams, n_nbr] neighbor idx (-1 = none)
    frame_ids: Tuple[int, ...],       # e.g. (0, -1, 1)
    do_intensity_align: bool = True,
    spatio: bool = True,
    spatio_temporal: bool = True,
    # depth-synthesis branch
    aug_depth: bool = False,
    extrinsics: Optional[jnp.ndarray] = None,       # [b, cams, 4, 4]
    extrinsics_aug: Optional[jnp.ndarray] = None,   # [b, cams, 4, 4]
    depth_aug: Optional[jnp.ndarray] = None,        # [b, cams, H, W, 1]
    min_depth: float = 1.5,
    max_depth: float = 200.0,
    windows: Optional[WarpWindows] = None,
    warp_op: str = "quad",
) -> RenderOutputs:
    """Render every warped view needed by the losses for one scale."""
    ctx_ids = list(frame_ids[1:])
    n_ctx = len(ctx_ids)
    b, cams = depth.shape[:2]
    nbr_valid = (rel_cam >= 0)
    rel_idx = jnp.maximum(rel_cam, 0)
    nbr_valid_f = nbr_valid.astype(depth.dtype)[None, :, :, None, None, None]

    # ---- temporal warps (reference :136-160) -----------------------------
    src_imgs = jnp.stack([colors[f] for f in ctx_ids], axis=2)  # [b,cams,n_ctx,H,W,3]
    dep = jnp.broadcast_to(depth[:, :, None], depth.shape[:2] + (n_ctx,) + depth.shape[2:])
    t_img, t_mask = warp_image(
        src_imgs,
        jnp.broadcast_to(mask[:, :, None], src_imgs.shape[:3] + mask.shape[2:]),
        dep,
        jnp.broadcast_to(inv_k[:, :, None], inv_k.shape[:2] + (n_ctx, 4, 4)),
        jnp.broadcast_to(k[:, :, None], k.shape[:2] + (n_ctx, 4, 4)),
        cam_t_cam,
        warp_op=warp_op,
    )
    if do_intensity_align:
        ref = jnp.broadcast_to(colors[0][:, :, None], t_img.shape)
        refm = jnp.broadcast_to(mask[:, :, None], t_mask.shape)
        t_img = intensity_align(ref, refm, t_img, t_mask)

    overlap_img = overlap_mask = None
    if spatio or spatio_temporal:
        n_nbr = rel_cam.shape[1]
        # neighbor sources, gathered once: [b, cams, n_nbr, H, W, C]
        nbr_mask = mask[:, rel_idx]
        nbr_k = k[:, rel_idx]

        def overlap_for(src_frame_colors, pose, origin=None, box_hw=None):
            """pose: [b, cams, n_nbr, 4, 4]; returns summed img/mask."""
            src = src_frame_colors[:, rel_idx]  # [b, cams, n_nbr, H, W, 3]
            depn = jnp.broadcast_to(depth[:, :, None], depth.shape[:2] + (n_nbr,) + depth.shape[2:])
            invkn = jnp.broadcast_to(inv_k[:, :, None],
                                     inv_k.shape[:2] + (n_nbr, 4, 4))
            if origin is not None:
                w_img, w_mask = warp_image_window(
                    src, nbr_mask, depn, invkn, nbr_k, pose,
                    origin, box_hw, warp_op=warp_op)
            else:
                w_img, w_mask = warp_image(src, nbr_mask, depn, invkn,
                                           nbr_k, pose, warp_op=warp_op,
                                           mxu_layout="patch")
            w_mask = w_mask * nbr_valid_f.astype(w_mask.dtype)
            if do_intensity_align:
                refi = jnp.broadcast_to(colors[0][:, :, None], w_img.shape)
                refm = jnp.broadcast_to(mask[:, :, None], w_mask.shape)
                w_img = intensity_align(refi, refm, w_img, w_mask)
            # sum over neighbors, zeroing invalid neighbor slots (valid
            # flags cast to the image dtype so a bf16 stack stays bf16)
            return (jnp.sum(w_img * nbr_valid_f.astype(w_img.dtype), axis=2),
                    jnp.sum(w_mask, axis=2))

        imgs, masks = [], []
        has_sp_win = windows is not None and windows.spatio_origin is not None
        has_st_win = windows is not None and windows.st_origin is not None
        o_img, o_mask = overlap_for(
            colors[0], spatio_pose,
            windows.spatio_origin if has_sp_win else None,
            windows.spatio_hw if has_sp_win else None)
        imgs.append(o_img)
        masks.append(o_mask)
        for fi, f in enumerate(ctx_ids):
            o_img, o_mask = overlap_for(
                colors[f], spatio_tempo_pose[:, :, fi],
                windows.st_origin[:, :, fi] if has_st_win else None,
                windows.st_hw if has_st_win else None)
            imgs.append(o_img)
            masks.append(o_mask)
        overlap_img = jnp.stack(imgs, axis=2)    # [b, cams, 1+n_ctx, H, W, 3]
        overlap_mask = jnp.stack(masks, axis=2)

    # ---- depth-synthesis branch (reference :200-241) ---------------------
    tform_depth = tform_mask = None
    if aug_depth:
        assert extrinsics is not None and extrinsics_aug is not None
        assert depth_aug is not None
        aug_ext_inv = invert_pose(extrinsics_aug)
        # sources: each camera's neighbors plus itself
        self_idx = jnp.arange(cams, dtype=rel_idx.dtype)[:, None]
        src_idx = jnp.concatenate([rel_idx, self_idx], axis=1)   # [cams, n_nbr+1]
        src_valid = jnp.concatenate(
            [nbr_valid, jnp.ones_like(self_idx, dtype=bool)], axis=1)
        n_src = src_idx.shape[1]

        src_depth = depth[:, src_idx]            # [b, cams, n_src, H, W, 1]
        src_mask_g = mask[:, src_idx]
        src_k_g = k[:, src_idx]
        src_invk_g = inv_k[:, src_idx]
        src_ext = extrinsics[:, src_idx]
        rel_pose = jnp.einsum("bcij,bcnjk->bcnik", aug_ext_inv, src_ext)
        dep_aug = jnp.broadcast_to(depth_aug[:, :, None],
                                   depth_aug.shape[:2] + (n_src,) + depth_aug.shape[2:])
        tform_depth, tform_mask = warp_depth(
            src_depth, src_mask_g, src_invk_g, src_k_g, dep_aug,
            jnp.broadcast_to(inv_k[:, :, None], inv_k.shape[:2] + (n_src, 4, 4)),
            rel_pose, min_depth, max_depth)
        tform_mask = tform_mask * src_valid.astype(depth.dtype)[None, :, :, None, None, None]

    return RenderOutputs(t_img, t_mask, overlap_img, overlap_mask,
                         tform_depth, tform_mask)
