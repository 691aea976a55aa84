"""Patch-packed bilinear image warp (gather-count-optimal, custom VJP).

Full-resolution view-synthesis warps dominate the training step (~35% —
measured: the spatio/spatio-temporal warp block costs ~350 ms/step at
batch 1 on v5e). The plain gather formulation issues 4 tap-gathers forward
and ~8 more in the autodiff backward per warp, each with tiny 12-byte rows.

This op packs the 2x2 bilinear footprint into channels up front
(``quad[y, x] = (img[y, x], img[y, x+1], img[y+1, x], img[y+1, x+1])``) so:

  * forward  = ONE row-gather of 4C channels + a weighted combine;
  * backward w.r.t. coords = ONE re-gather of the same quad + closed-form
    weight derivatives (no gathers materialized by autodiff);
  * backward w.r.t. the image is ZERO by contract — only use this op for
    warping *input* images/masks (photometric sources are constants;
    reference ``view_rendering.py:61-82``). ``warp_depth`` keeps the
    differentiable sampler since warped depths carry gradients.

Border handling: the footprint base is clamped to [0, size-2] per axis and
the two channel weights are re-derived from the clamp offset, which
reproduces zeros-padding bilinear exactly (out-of-range taps get weight 0,
in-range taps keep their weight) — verified against the gather reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def build_quad(img: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H, W, 4C] footprint channels (zero-padded shifts;
    the pad rows/cols are never addressed because bases clamp to size-2)."""
    z_col = jnp.zeros_like(img[:, :, :1, :])
    sx = jnp.concatenate([img[:, :, 1:, :], z_col], axis=2)
    z_row = jnp.zeros_like(img[:, :1, :, :])
    sy = jnp.concatenate([img[:, 1:, :, :], z_row], axis=1)
    sxy = jnp.concatenate([sy[:, :, 1:, :], jnp.zeros_like(sy[:, :, :1, :])], axis=2)
    return jnp.concatenate([img, sx, sy, sxy], axis=-1)


def _axis_weights(coord: jnp.ndarray, size: int):
    """Per-axis clamped-base index + 2 channel weights + their d/dfrac.

    For pixel coordinate p with floor p0 and frac t:
      base b = clip(p0, 0, size-2), off = p0 - b in {-1, 0, +1, ...}
      weight(ch0 @ b)   = (1-t)*[off==0] + t*[off==-1]
      weight(ch1 @ b+1) = t*[off==0] + (1-t)*[off==+1]
    which equals zeros-padding bilinear for every case (off outside
    {-1,0,1} -> both weights 0).
    """
    p0 = jnp.floor(coord)
    t = coord - p0
    i0 = p0.astype(jnp.int32)
    base = jnp.clip(i0, 0, size - 2)
    off = i0 - base
    is0 = (off == 0).astype(coord.dtype)
    ism1 = (off == -1).astype(coord.dtype)
    isp1 = (off == 1).astype(coord.dtype)
    w0 = (1 - t) * is0 + t * ism1
    w1 = t * is0 + (1 - t) * isp1
    dw0 = -is0 + ism1          # d w0 / d t
    dw1 = is0 - isp1
    return base, w0, w1, dw0, dw1


def _tap_data(coords: jnp.ndarray, h: int, w: int):
    finite = jnp.all(jnp.isfinite(coords), axis=-1)
    coords = jnp.where(finite[..., None], coords, -4.0)
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    # huge-but-finite NDC coords (near-zero projection depth) overflow the
    # transform to +-inf and x - floor(x) then NaNs the weights; any
    # |pixel| beyond the image is an all-dead tap, so a finite clamp is
    # semantics-preserving (mirrors ops/warp_mxu._prep)
    x = jnp.clip(x, -1e6, 1e6)
    y = jnp.clip(y, -1e6, 1e6)
    xb, ax0, ax1, dax0, dax1 = _axis_weights(x, w)
    yb, ay0, ay1, day0, day1 = _axis_weights(y, h)
    idx = yb * w + xb
    return idx, (ax0, ax1, dax0, dax1), (ay0, ay1, day0, day1)


def _gather_quad(quad_flat: jnp.ndarray, idx: jnp.ndarray, c: int):
    rows = jnp.take_along_axis(quad_flat, idx[..., None], axis=1)  # [B, N, 4C]
    return rows[..., 0:c], rows[..., c:2 * c], rows[..., 2 * c:3 * c], rows[..., 3 * c:]


def _combine(taps, ax, ay):
    q00, q01, q10, q11 = taps
    ax0, ax1 = ax
    ay0, ay1 = ay
    return ((ax0 * ay0)[..., None] * q00 + (ax1 * ay0)[..., None] * q01
            + (ax0 * ay1)[..., None] * q10 + (ax1 * ay1)[..., None] * q11)


def _nearest_axis_weights(w0, w1):
    """Round the two bilinear channel weights to one-hot -> exact NEAREST
    sampling through the same gathered footprint (round(x) picks the tap
    with the larger weight; OOB taps already have weight 0, matching
    zeros-padding nearest)."""
    pick1 = (w1 > w0).astype(w0.dtype)
    any_w = ((w0 + w1) > 0.5).astype(w0.dtype)  # both-zero stays zero
    return (1 - pick1) * any_w, pick1 * any_w


@jax.custom_vjp
def warp_image_mask_quad(img: jnp.ndarray, mask: jnp.ndarray,
                         coords: jnp.ndarray):
    """Jointly warp image (bilinear) + mask (nearest) with ONE row-gather.

    The mask is appended to the packed footprint, so a warp costs a single
    gather of 4(C+1) channels; the mask channels combine with rounded
    (one-hot) weights which reproduces nearest sampling exactly. Gradients
    flow to coords only (through the image channels; nearest has zero
    coordinate gradient).

    img: [B, H, W, C]; mask: [B, H, W, 1]; coords: [B, N, 2].
    Returns (img_w [B, N, C], mask_w [B, N, 1]).
    """
    b, h, w, c = img.shape
    quad = build_quad(jnp.concatenate([img, mask.astype(img.dtype)], axis=-1))
    quad = quad.reshape(b, h * w, 4 * (c + 1))
    idx, (ax0, ax1, _, _), (ay0, ay1, _, _) = _tap_data(coords, h, w)
    q00, q01, q10, q11 = _gather_quad(quad, idx, c + 1)
    img_w = _combine((q00[..., :c], q01[..., :c], q10[..., :c], q11[..., :c]),
                     (ax0, ax1), (ay0, ay1))
    nx0, nx1 = _nearest_axis_weights(ax0, ax1)
    ny0, ny1 = _nearest_axis_weights(ay0, ay1)
    mask_w = _combine((q00[..., c:], q01[..., c:], q10[..., c:], q11[..., c:]),
                      (nx0, nx1), (ny0, ny1))
    return img_w, mask_w


def _warp_im_fwd(img, mask, coords):
    return warp_image_mask_quad(img, mask, coords), (img, mask, coords)


def _warp_im_bwd(res, gs):
    """Coordinate gradient via a re-gather that is BIT-IDENTICAL to the
    forward gather (same 4(C+1)-channel quad, same indices) so XLA CSE
    merges the two into one device gather — re-gathering a different
    (mask-less) quad would double the dominant gather cost."""
    img, mask, coords = res
    g_img, g_mask = gs  # mask grad contributes nothing to coords (nearest)
    b, h, w, c = img.shape
    quad = build_quad(jnp.concatenate([img, mask.astype(img.dtype)], axis=-1))
    quad = quad.reshape(b, h * w, 4 * (c + 1))
    idx, (ax0, ax1, dax0, dax1), (ay0, ay1, day0, day1) = _tap_data(coords, h, w)
    q00, q01, q10, q11 = _gather_quad(quad, idx, c + 1)
    q00, q01, q10, q11 = q00[..., :c], q01[..., :c], q10[..., :c], q11[..., :c]

    d_dx = ((dax0 * ay0)[..., None] * q00 + (dax1 * ay0)[..., None] * q01
            + (dax0 * ay1)[..., None] * q10 + (dax1 * ay1)[..., None] * q11)
    d_dy = ((ax0 * day0)[..., None] * q00 + (ax1 * day0)[..., None] * q01
            + (ax0 * day1)[..., None] * q10 + (ax1 * day1)[..., None] * q11)
    gx = jnp.sum(g_img * d_dx, axis=-1) * (0.5 * (w - 1))
    gy = jnp.sum(g_img * d_dy, axis=-1) * (0.5 * (h - 1))
    dcoords = jnp.stack([gx, gy], axis=-1).astype(coords.dtype)
    finite = jnp.all(jnp.isfinite(coords), axis=-1, keepdims=True)
    dcoords = jnp.where(finite, dcoords, 0.0)
    return (jnp.zeros_like(img),
            jnp.zeros(img.shape[:-1] + (1,), img.dtype),
            dcoords)


@jax.custom_vjp
def warp_image_quad(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp of a constant image; gradient flows to coords only.

    img: [B, H, W, C]; coords: [B, N, 2] normalized (x, y) in [-1, 1]
    (align_corners). Returns [B, N, C].
    """
    b, h, w, c = img.shape
    quad = build_quad(img).reshape(b, h * w, 4 * c)
    idx, (ax0, ax1, _, _), (ay0, ay1, _, _) = _tap_data(coords, h, w)
    taps = _gather_quad(quad, idx, c)
    return _combine(taps, (ax0, ax1), (ay0, ay1))


def _warp_fwd(img, coords):
    return warp_image_quad(img, coords), (img, coords)


def _warp_bwd(res, g):
    img, coords = res
    b, h, w, c = img.shape
    quad = build_quad(img).reshape(b, h * w, 4 * c)
    idx, (ax0, ax1, dax0, dax1), (ay0, ay1, day0, day1) = _tap_data(coords, h, w)
    q00, q01, q10, q11 = _gather_quad(quad, idx, c)

    d_dx = ((dax0 * ay0)[..., None] * q00 + (dax1 * ay0)[..., None] * q01
            + (dax0 * ay1)[..., None] * q10 + (dax1 * ay1)[..., None] * q11)
    d_dy = ((ax0 * day0)[..., None] * q00 + (ax1 * day0)[..., None] * q01
            + (ax0 * day1)[..., None] * q10 + (ax1 * day1)[..., None] * q11)
    # chain: pixel coord = (norm + 1)/2 * (size-1)
    gx = jnp.sum(g * d_dx, axis=-1) * (0.5 * (w - 1))
    gy = jnp.sum(g * d_dy, axis=-1) * (0.5 * (h - 1))
    dcoords = jnp.stack([gx, gy], axis=-1).astype(coords.dtype)
    # non-finite input coords were replaced by a constant -> zero grads there
    finite = jnp.all(jnp.isfinite(coords), axis=-1, keepdims=True)
    dcoords = jnp.where(finite, dcoords, 0.0)
    return jnp.zeros_like(img), dcoords


warp_image_quad.defvjp(_warp_fwd, _warp_bwd)


warp_image_mask_quad.defvjp(_warp_im_fwd, _warp_im_bwd)
