"""Gather-based grid sampling (torch ``F.grid_sample`` semantics on TPU).

XLA has no native grid_sample; these are pure-XLA gather formulations with
exact ``align_corners=True`` + ``padding_mode='zeros'`` semantics, which is
what the reference uses everywhere:
  * 2D bilinear image warps (reference ``models/geometry/view_rendering.py:74-78``)
  * 2D bilinear/nearest voxel back-projection sampling
    (reference ``network/volumetric_fusionnet.py:143,188``)
  * 3D trilinear voxel -> frustum sampling
    (reference ``network/volumetric_fusionnet.py:261``)

Out-of-bounds taps contribute zero (per-tap validity, like torch zeros
padding). Non-finite coordinates produce zeros here; callers that need the
reference's NaN -> 2.0 image fill apply it via the returned ``finite`` mask.

A fused Pallas variant for the hot 3D path lives in ``pallas_sample.py``;
this module is the reference implementation and the CPU/test path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """[-1, 1] -> [0, size-1] pixel coordinates (align_corners=True)."""
    return (coord + 1.0) * 0.5 * (size - 1)


def _flatten_batch(img: jnp.ndarray, coords: jnp.ndarray, spatial_ndim: int):
    """Reshape [...batch, *spatial, C] and [...batch, *pts, k] to flat batch."""
    k = coords.shape[-1]
    batch_shape = img.shape[: img.ndim - spatial_ndim - 1]
    pts_shape = coords.shape[len(batch_shape):-1]
    assert coords.shape[: len(batch_shape)] == batch_shape, (
        f"batch mismatch {img.shape} vs {coords.shape}")
    b = 1
    for s in batch_shape:
        b *= s
    img_flat = img.reshape((b,) + img.shape[img.ndim - spatial_ndim - 1:])
    n = 1
    for s in pts_shape:
        n *= s
    coords_flat = coords.reshape(b, n, k)
    return img_flat, coords_flat, batch_shape, pts_shape


def grid_sample_2d(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    mode: str = "bilinear",
    with_finite_mask: bool = False,
):
    """Sample ``img`` at normalized ``coords``.

    Args:
      img: [..., H, W, C].
      coords: [..., *pts, 2] with last dim (x, y) in [-1, 1]; leading dims
        must equal img's leading (batch) dims.
      mode: "bilinear" or "nearest".
      with_finite_mask: also return a [..., *pts, 1] float mask that is 0
        where any input coordinate was non-finite (for NaN-fill emulation).

    Returns: [..., *pts, C] (and optionally the finite mask).
    """
    img_flat, coords_flat, batch_shape, pts_shape = _flatten_batch(img, coords, 2)
    b, h, w, c = img_flat.shape
    n = coords_flat.shape[1]

    finite = jnp.all(jnp.isfinite(coords_flat), axis=-1)  # [b, n]
    coords_flat = jnp.where(finite[..., None], coords_flat, -2.0)

    x = _unnormalize(coords_flat[..., 0], w)
    y = _unnormalize(coords_flat[..., 1], h)

    flat_img = img_flat.reshape(b, h * w, c)

    def tap(ix, iy, weight):
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        vals = jnp.take_along_axis(flat_img, idx[..., None], axis=1)
        return vals * (weight * valid.astype(img.dtype))[..., None]

    if mode == "nearest":
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        out = tap(ix, iy, jnp.ones_like(x))
    elif mode == "bilinear":
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0).astype(img.dtype)
        wy = (y - y0).astype(img.dtype)
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        out = (
            tap(ix0, iy0, (1 - wx) * (1 - wy))
            + tap(ix0 + 1, iy0, wx * (1 - wy))
            + tap(ix0, iy0 + 1, (1 - wx) * wy)
            + tap(ix0 + 1, iy0 + 1, wx * wy)
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")

    out = out.reshape(batch_shape + pts_shape + (c,))
    if with_finite_mask:
        fmask = finite.astype(img.dtype).reshape(batch_shape + pts_shape + (1,))
        return out, fmask
    return out


def _trilinear_taps(vol_shape, coords):
    """Shared tap computation: [..., N, 3] coords -> idx [..., N, 8] flat
    indices into d*h*w and weights [..., N, 8] (zeros for invalid taps)."""
    d, h, w = vol_shape
    finite = jnp.all(jnp.isfinite(coords), axis=-1)
    coords = jnp.where(finite[..., None], coords, -2.0)
    x = _unnormalize(coords[..., 0], w)
    y = _unnormalize(coords[..., 1], h)
    z = _unnormalize(coords[..., 2], d)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = x - x0
    wy = y - y0
    wz = z - z0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    iz0 = z0.astype(jnp.int32)

    idxs, wgts = [], []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ix, iy, iz = ix0 + dx, iy0 + dy, iz0 + dz
                valid = ((ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
                         & (iz >= 0) & (iz < d))
                idx = (jnp.clip(iz, 0, d - 1) * h + jnp.clip(iy, 0, h - 1)) * w \
                    + jnp.clip(ix, 0, w - 1)
                wgt = ((wx if dx else 1 - wx) * (wy if dy else 1 - wy)
                       * (wz if dz else 1 - wz)) * valid
                idxs.append(idx)
                wgts.append(wgt)
    return jnp.stack(idxs, axis=-1), jnp.stack(wgts, axis=-1)


@jax.custom_vjp
def grid_sample_3d_nocoordgrad(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample with coords treated as constants (no coord gradient).

    The voxel->frustum reprojection's coordinates come from calibration
    constants (reference ``volumetric_fusionnet.py:243-261``), so only
    d/d(vol) is needed. The custom VJP emits ONE fused scatter-add of all
    8 taps instead of autodiff's 8 separate scatters (~2-4x faster backward
    on TPU, where scatters dominate).

    vol: [B, D, H, W, C]; coords: [B, *pts, 3]. Returns [B, *pts, C].
    """
    return grid_sample_3d(vol, coords)


def _gs3d_fwd(vol, coords):
    return grid_sample_3d(vol, coords), (coords, vol.shape)


def _gs3d_bwd(res, g):
    """One fused 8-tap scatter-add (measured ~140-170 ms on v5e).

    A windowed-scatter variant (x-pair [2, C] windows via
    lax.scatter_add with update_window_dims) halves the row count on paper
    but lowers catastrophically on TPU (~16 s — 100x slower); plain
    row-indexed .at[idx].add is the fastest scatter form available."""
    coords, vol_shape = res
    b = vol_shape[0]
    d, h, w, c = vol_shape[1], vol_shape[2], vol_shape[3], vol_shape[4]
    coords_flat = coords.reshape(b, -1, 3)
    g_flat = g.reshape(b, -1, c)
    idx, wgt = _trilinear_taps((d, h, w), coords_flat)  # [b, n, 8]
    n = idx.shape[1]
    updates = (g_flat[:, :, None, :] * wgt[..., None]).astype(g.dtype)
    updates = updates.reshape(b, n * 8, c)
    idx_all = idx.reshape(b, n * 8)
    dvol = jnp.zeros((b, d * h * w, c), g.dtype)
    dvol = jax.vmap(lambda acc, i, u: acc.at[i].add(u))(dvol, idx_all, updates)
    return dvol.reshape(vol_shape), jnp.zeros_like(coords)


grid_sample_3d_nocoordgrad.defvjp(_gs3d_fwd, _gs3d_bwd)


def grid_sample_3d(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of ``vol`` at normalized ``coords`` (zeros padding).

    Args:
      vol: [..., D, H, W, C] (D = z, H = y, W = x — torch 3D grid_sample layout).
      coords: [..., *pts, 3] with last dim (x, y, z) in [-1, 1].
    Returns: [..., *pts, C].
    """
    vol_flat, coords_flat, batch_shape, pts_shape = _flatten_batch(vol, coords, 3)
    b, d, h, w, c = vol_flat.shape

    finite = jnp.all(jnp.isfinite(coords_flat), axis=-1)
    coords_flat = jnp.where(finite[..., None], coords_flat, -2.0)

    x = _unnormalize(coords_flat[..., 0], w)
    y = _unnormalize(coords_flat[..., 1], h)
    z = _unnormalize(coords_flat[..., 2], d)

    flat_vol = vol_flat.reshape(b, d * h * w, c)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = (x - x0).astype(vol.dtype)
    wy = (y - y0).astype(vol.dtype)
    wz = (z - z0).astype(vol.dtype)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    iz0 = z0.astype(jnp.int32)

    def tap(ix, iy, iz, weight):
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h) & (iz >= 0) & (iz < d)
        idx = (jnp.clip(iz, 0, d - 1) * h + jnp.clip(iy, 0, h - 1)) * w + jnp.clip(ix, 0, w - 1)
        vals = jnp.take_along_axis(flat_vol, idx[..., None], axis=1)
        return vals * (weight * valid.astype(vol.dtype))[..., None]

    out = (
        tap(ix0, iy0, iz0, (1 - wx) * (1 - wy) * (1 - wz))
        + tap(ix0 + 1, iy0, iz0, wx * (1 - wy) * (1 - wz))
        + tap(ix0, iy0 + 1, iz0, (1 - wx) * wy * (1 - wz))
        + tap(ix0 + 1, iy0 + 1, iz0, wx * wy * (1 - wz))
        + tap(ix0, iy0, iz0 + 1, (1 - wx) * (1 - wy) * wz)
        + tap(ix0 + 1, iy0, iz0 + 1, wx * (1 - wy) * wz)
        + tap(ix0, iy0 + 1, iz0 + 1, (1 - wx) * wy * wz)
        + tap(ix0 + 1, iy0 + 1, iz0 + 1, wx * wy * wz)
    )
    return out.reshape(batch_shape + pts_shape + (c,))
