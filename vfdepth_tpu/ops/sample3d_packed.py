"""Row-packed trilinear 3D sampling: ONE wide-row gather / scatter per point.

TPU XLA gathers and scatters are row-count-bound (~40-100M rows/s almost
independent of row width; see docs/PERF.md "Gather economics").  The plain
formulation of the voxel->frustum trilinear sample (reference
``network/volumetric_fusionnet.py:261``, ours ``ops/grid_sample.py``) issues
8 tap-gathers forward and one fused 8-tap scatter backward — 9.2M rows per
direction at DDAD shapes, ~30 ms fwd + ~150 ms bwd on v5e.

This module packs the whole 2x2x2 trilinear footprint into the channel axis
("oct" layout) so each point costs ONE row:

  forward:  vol [B,D,H,W,C] -> transpose [B,H,W,D,C] -> 8 shifted copies
            stacked as vol_oct [B, H*W*D, 8*C]; one gather of [B,N] rows,
            then an in-register weighted combine of the 8 tap slices.
  backward: updates [B,N,8*C] = (tap weights x g) scattered by ONE
            ``.at[idx].add`` into a zero oct accumulator, then 8 *dense*
            shift-adds fold the taps back into vol layout (dense adds are
            bandwidth-trivial next to the scatter).

Semantics are exactly align_corners=True + zeros padding (torch
``F.grid_sample(mode='bilinear')`` in 3D): footprint bases clamp to
[0, size-2] per axis and the two per-axis weights are re-derived from the
clamp offset, so out-of-range taps get weight 0 (the warp_quad trick).
Non-finite coordinates produce zeros. Coordinates carry no gradient (they
are functions of calibration constants in the reprojection).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step of the combine/updates kernels (pure elementwise
# streams; the block just has to amortize grid overhead and fit VMEM)
_ROWS_BLK = 4096
# in-kernel row sub-chunk: the 8 unrolled tap fmas each materialize
# [rows, C]-f32 temporaries that pad C < 128 out to a full lane tile, and
# Mosaic keeps every unrolled iteration's temps live on the kernel stack —
# at 4096 rows x C=64 that is ~35 MB against the 16 MB scoped-vmem limit
# (a real-chip compile failure the CPU interpreter cannot see). A fori_loop
# over 256-row sub-chunks forces sequential stack reuse (512 rows still
# measured 0.6 MB over the limit on top of the double-buffered blocks).
_ROWS_SUB = 256


def _kernel_axis_weights(coord, size: int):
    """The 2 per-axis tap weights for a [sub, 1] f32 pixel-coord column.

    For pixel coordinate p with floor p0, frac t and clamped base
    base = clip(p0, 0, size-2), off = p0 - base:
      w(ch0 @ base)   = (1-t)*[off==0] + t*[off==-1]
      w(ch1 @ base+1) = t*[off==0] + (1-t)*[off==+1]
    which equals zeros-padding bilinear on that axis for every case
    (|off| > 1 -> both weights 0). Bases match ``_tap_index``."""
    p0 = jnp.floor(coord)
    t = coord - p0
    i0 = p0.astype(jnp.int32)
    base = jnp.clip(i0, 0, size - 2)
    off = i0 - base
    is0 = (off == 0).astype(jnp.float32)
    ism1 = (off == -1).astype(jnp.float32)
    isp1 = (off == 1).astype(jnp.float32)
    w0 = (1 - t) * is0 + t * ism1
    w1 = t * is0 + (1 - t) * isp1
    return w0, w1


def _kernel_tap_weights(coords, d: int, h: int, w: int):
    """In-kernel mirror of ``_tap_index_weights``'s weight half on a
    [sub, 3] f32 block -> eight [sub, 1] tap weights (dy fastest /
    dz slowest, matching ``_TAPS`` / ``_build_oct``).

    Computing the weights where they are consumed kills ~20 ms/step of
    lane-padded HBM streams at DDAD shapes: the caller-side build wrote
    eight [N, 1] f32 intermediates plus a [N, 8] concat, each padded
    to 128 lanes under TPU tiling (16-128x the useful bytes)."""
    finite = (jnp.isfinite(coords[:, 0:1]) & jnp.isfinite(coords[:, 1:2])
              & jnp.isfinite(coords[:, 2:3]))
    x = jnp.where(finite, coords[:, 0:1], -4.0)
    y = jnp.where(finite, coords[:, 1:2], -4.0)
    z = jnp.where(finite, coords[:, 2:3], -4.0)
    x = (x + 1.0) * 0.5 * (w - 1)
    y = (y + 1.0) * 0.5 * (h - 1)
    z = (z + 1.0) * 0.5 * (d - 1)
    wx0, wx1 = _kernel_axis_weights(x, w)
    wy0, wy1 = _kernel_axis_weights(y, h)
    wz0, wz1 = _kernel_axis_weights(z, d)
    # tap order must match _build_oct / _TAPS: (dz, dx, dy) bit order with
    # dy FASTEST and dz SLOWEST — each backward fold stage then halves a
    # lane-aligned channel block (see _packed_bwd)
    return (wz0 * wx0 * wy0, wz0 * wx0 * wy1,
            wz0 * wx1 * wy0, wz0 * wx1 * wy1,
            wz1 * wx0 * wy0, wz1 * wx0 * wy1,
            wz1 * wx1 * wy0, wz1 * wx1 * wy1)


def _combine_kernel(c: int, d: int, h: int, w: int, blk: int, rows_ref,
                    crd_ref, out_ref):
    """rows [blk, 8C] bf16, crd [blk, 3] f32 -> out [blk, C] (one pass)."""
    def body(k, _):
        sl = pl.ds(k * _ROWS_SUB, _ROWS_SUB)
        wgt = _kernel_tap_weights(crd_ref[sl, :], d, h, w)
        acc = rows_ref[sl, 0:c].astype(jnp.float32) * wgt[0]
        for t in range(1, 8):
            acc += (rows_ref[sl, t * c:(t + 1) * c].astype(jnp.float32)
                    * wgt[t])
        out_ref[sl, :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, blk // _ROWS_SUB, body, 0)


def _combine_taps(rows: jnp.ndarray, coords: jnp.ndarray, c: int,
                  d: int, h: int, w: int) -> jnp.ndarray:
    """One-pass weighted tap combine: [B, N, 8C] x coords [B, N, 3]
    -> [B, N, C]; tap weights computed in-kernel (see _kernel_tap_weights).

    XLA's fusion of the 8-slice multiply-add loop re-streams slices of the
    [N, 8C] gather output through several loop fusions (~4-6 ms/step at
    DDAD shapes); this kernel reads it exactly once.
    """
    b, n, _ = rows.shape
    # f32 rows double the VMEM block; halve the row block to stay inside
    # the 16 MB scoped limit (observed compile-time OOM at 8C=512 f32)
    blk = _ROWS_BLK // 2 if rows.dtype == jnp.float32 else _ROWS_BLK
    return pl.pallas_call(
        functools.partial(_combine_kernel, c, d, h, w, blk),
        grid=(b, -(-n // blk)),
        in_specs=[
            pl.BlockSpec((None, blk, 8 * c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, blk, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, blk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), rows.dtype),
        interpret=(jax.default_backend() != "tpu"),
    )(rows, coords.astype(jnp.float32))


def _updates_kernel(c: int, d: int, h: int, w: int, blk: int, g_ref, crd_ref,
                    out_ref):
    """g [blk, C], crd [blk, 3] f32 -> updates [blk, 8C] (one pass)."""
    def body(k, _):
        sl = pl.ds(k * _ROWS_SUB, _ROWS_SUB)
        g = g_ref[sl, :].astype(jnp.float32)
        wgt = _kernel_tap_weights(crd_ref[sl, :], d, h, w)
        for t in range(8):
            out_ref[sl, t * c:(t + 1) * c] = (wgt[t] * g).astype(
                out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, blk // _ROWS_SUB, body, 0)


def _build_updates(g: jnp.ndarray, coords: jnp.ndarray, c: int,
                   d: int, h: int, w: int, out_dtype) -> jnp.ndarray:
    """One-pass scatter-update build: [B, N, C] x coords [B, N, 3]
    -> [B, N, 8C]; tap weights computed in-kernel.

    The concat-of-products form spent two extra passes over the [N, 8C]
    stream (~8 ms/step at DDAD shapes f32, ~5 ms bf16)."""
    b, n, _ = g.shape
    blk = _ROWS_BLK // 2 if out_dtype == jnp.float32 else _ROWS_BLK
    return pl.pallas_call(
        functools.partial(_updates_kernel, c, d, h, w, blk),
        grid=(b, -(-n // blk)),
        in_specs=[
            pl.BlockSpec((None, blk, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, blk, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, blk, 8 * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, 8 * c), out_dtype),
        interpret=(jax.default_backend() != "tpu"),
    )(g, coords.astype(jnp.float32))


def _tap_index(coords: jnp.ndarray, d: int, h: int, w: int):
    """coords [B, N, 3] (x, y, z normalized) -> flat base idx [B, N] into
    (h*w*d) in [y, x, z] order. The 8 tap weights are computed INSIDE the
    combine/updates kernels (_kernel_tap_weights) from the same coords —
    materializing them host-side cost ~20 ms/step of lane-padded streams."""
    finite = jnp.all(jnp.isfinite(coords), axis=-1)
    coords = jnp.where(finite[..., None], coords, -4.0)
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    z = (coords[..., 2] + 1.0) * 0.5 * (d - 1)
    xb = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    yb = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    zb = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, d - 2)
    return (yb * w + xb) * d + zb


def _shift(a: jnp.ndarray, axis: int, delta: int) -> jnp.ndarray:
    """Shift ``a`` by -delta along ``axis`` zero-filling (delta in {0, 1}):
    out[i] = a[i + delta] (the oct copy at base i holds vol[i + delta])."""
    if delta == 0:
        return a
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(1, None)
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, 1)
    return jnp.pad(a[tuple(sl)], pad)


def _shift_fwd(a: jnp.ndarray, axis: int, delta: int) -> jnp.ndarray:
    """Inverse of _shift for the backward fold: gradient accumulated at base
    i for the (+delta) tap belongs to vol[i + delta] -> out[j] = a[j - delta]
    (zero-fill at the front). Bases never exceed size-2 so nothing is lost
    off the end."""
    if delta == 0:
        return a
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(0, a.shape[axis] - 1)
    pad = [(0, 0)] * a.ndim
    pad[axis] = (1, 0)
    return jnp.pad(a[tuple(sl)], pad)


# tap index bit order: dy fastest, dx middle, dz slowest — so the backward
# fold can halve the [.., 8C] channel block axis-by-axis with every slice
# lane-aligned down to 2C (see _packed_bwd)
_TAPS = [(dy, dx, dz) for dz in (0, 1) for dx in (0, 1) for dy in (0, 1)]

# Backward scatter update dtype. The oct scatter reads its update rows once
# and accumulates ~6 collisions per voxel; bf16 updates halve the dominant
# HBM stream (2.36 GB -> 1.18 GB of update rows at DDAD shapes) at a ~2^-8
# relative quantization of each tap contribution — measured gradient cosine
# vs the f32 path > 0.9999 (tests/test_sample3d_packed.py). "f32" restores
# exact accumulation (config `tpu: sampler_3d: packed_f32grad`).
_GRAD_DTYPES = {"bf16": jnp.bfloat16, "f32": jnp.float32}


def _build_oct(vol_t: jnp.ndarray) -> jnp.ndarray:
    """vol_t [B, H, W, D, C] -> [B, H*W*D, 8*C] with the 8 shifted copies
    stacked along channels (tap order = _TAPS, dy fastest / dz slowest)."""
    b, h, w, d, c = vol_t.shape
    # one zero-padded copy + 8 static slices: a single concat fusion writes
    # the oct layout in one pass (the stack-of-shifts form compiled to a
    # while loop re-reading the volume 8 times, ~4 ms/step at DDAD shapes)
    pad = jnp.pad(vol_t, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
    copies = [pad[:, dy:dy + h, dx:dx + w, dz:dz + d, :]
              for dy, dx, dz in _TAPS]
    oct = jnp.concatenate(copies, axis=-1)  # [B, H, W, D, 8*C]
    return oct.reshape(b, h * w * d, 8 * c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grid_sample_3d_packed(vol: jnp.ndarray, coords: jnp.ndarray,
                          grad_dtype: str = "bf16",
                          vol_layout: str = "zyx") -> jnp.ndarray:
    """Trilinear sample (zeros padding, align_corners) with packed rows.

    vol: [B, D, H, W, C] (D = z, H = y, W = x — torch 3D grid_sample layout)
    for vol_layout="zyx", or [B, H, W, D, C] for vol_layout="yxz" — the
    kernel's native row order, which skips the 26 MB transpose on BOTH
    sides (the voxel pipeline stores its volume z-fastest for exactly this;
    geometry/projection.voxel_points_homo).
    coords: [B, *pts, 3] with last dim (x, y, z) in [-1, 1].
    grad_dtype: "bf16" (default; halves the backward scatter's update
    stream) or "f32" (exact accumulation) — see _GRAD_DTYPES.
    Returns [B, *pts, C]. Gradient flows to vol only (coords are constants
    in the voxel->frustum reprojection).
    """
    return _packed_fwd_impl(vol, coords, vol_layout)


def _packed_fwd_impl(vol, coords, vol_layout):
    if vol_layout == "zyx":
        b, d, h, w, c = vol.shape
        vol_t = jnp.moveaxis(vol, 1, 3)  # [B, H, W, D, C]
    else:
        assert vol_layout == "yxz", vol_layout
        b, h, w, d, c = vol.shape
        vol_t = vol
    pts_shape = coords.shape[1:-1]
    coords_flat = coords.reshape(b, -1, 3)
    oct = _build_oct(vol_t)
    idx = _tap_index(coords_flat, d, h, w)
    # bases clamp per-axis to [0, size-2] so the flat index is always in
    # bounds — promising it skips XLA's out-of-bounds select pass over the
    # [N, 8C] gather output (~3.6 ms/step at DDAD shapes)
    rows = jnp.take_along_axis(oct, idx[..., None], axis=1,
                               mode="promise_in_bounds")  # [B, N, 8C]
    # one-pass Pallas tap combine (a [N, 8, c] reshape view makes XLA
    # materialize a transposed copy of the 0.6 GB gather output; the
    # 8-slice fma loop re-streams it through several fusions)
    out = _combine_taps(rows, coords_flat, c, d, h, w)
    return out.reshape((b,) + pts_shape + (c,))


def _packed_fwd(vol, coords, grad_dtype, vol_layout):
    # (custom_vjp fwd gets args in original order; bwd gets nondiff first)
    return _packed_fwd_impl(vol, coords, vol_layout), (coords, vol.shape)


def _packed_bwd(grad_dtype, vol_layout, res, g):
    coords, vol_shape = res
    if vol_layout == "zyx":
        b, d, h, w, c = vol_shape
    else:
        b, h, w, d, c = vol_shape
    acc_dtype = _GRAD_DTYPES[grad_dtype]
    coords_flat = coords.reshape(b, -1, 3)
    n = coords_flat.shape[1]
    g_flat = g.reshape(b, n, c)
    idx = _tap_index(coords_flat, d, h, w)
    # Build [n, 8c] in ONE Pallas pass (the concat-of-products form and the
    # [n, 8, c] broadcast form both re-streamed the 8C-wide row stream
    # through extra fusions / transpose copies). Products are computed in
    # f32 and rounded once to acc_dtype (see _GRAD_DTYPES on bf16).
    updates = _build_updates(g_flat, coords_flat, c, d, h, w, acc_dtype)
    acc = jnp.zeros((b, h * w * d, 8 * c), acc_dtype)
    acc = jax.vmap(lambda a, i, u: a.at[i].add(u))(acc, idx, updates)
    acc = acc.reshape(b, h, w, d, 8 * c)
    # fold the 8 tap planes back into vol layout one AXIS at a time,
    # halving the channel block per stage (f32 accumulation). The _TAPS
    # bit order (dy fastest, dz slowest) makes every stage's two slices
    # contiguous and lane-aligned down to 2C; the per-tap form sliced
    # C=64-wide blocks that TPU tiling padded out to 128 lanes, doubling
    # every stream (~6 ms/step at DDAD shapes).
    def fold_axis(a, axis, half_c):
        lo = a[..., :half_c].astype(jnp.float32)
        hi = _shift_fwd(a[..., half_c:], axis, 1).astype(jnp.float32)
        return lo + hi

    x4 = fold_axis(acc, 3, 4 * c)    # fold dz (the d axis)
    x2 = fold_axis(x4, 2, 2 * c)     # fold dx
    dvol_t = fold_axis(x2, 1, c)     # fold dy
    if vol_layout == "zyx":
        dvol_t = jnp.moveaxis(dvol_t, 3, 1)
    return dvol_t.astype(g.dtype), jnp.zeros_like(coords)


grid_sample_3d_packed.defvjp(_packed_fwd, _packed_bwd)
