"""Pallas TPU kernels: bilinear sampling as banded in-VMEM one-hot matmuls.

The hot op of voxel back-projection — sample a small fusion-level feature map
(48x80) at ~200k projected voxel centers per camera — is pathological for
XLA on TPU (gather fwd ~61 ms, scatter-add bwd ~120 ms with minutes-long
compiles; measured v5e). These kernels express both directions as MXU
matmuls against a 4-tap one-hot weight matrix that is built *inside* the
kernel and never leaves VMEM:

  forward : out[n, c]  = W[n, band] @ img[band, c]   (summed over y-bands)
  backward: dimg[p, c] = W[band, n]^T @ g[n, c]      (accumulated over tiles)

The weight matrix is built per 2-D *(y, x) band* of ``_SB`` source rows x
``_XB`` columns rather than over the whole image: voxel points are
(y, x, z)-ordered, so a 256-point sub-tile is a handful of voxel
z-columns whose projections cluster in BOTH image axes, and the one-hot
contraction shrinks from h*w to _SB*_XB (measured 2.9x fewer MACs than
the earlier full-width y-band form on the nuScenes bench rig, before the
per-y-segment x-span tightening). Bands live on an aligned lattice with
DYNAMIC loop trip counts — fully out-of-FOV sub-tiles (50-70% of the
volume per camera) run zero band iterations, and each live y-segment
computes its own x-span over the points whose taps touch it.

Coordinates carry no gradient (they are functions of calibration constants
in the back-projection; reference ``network/volumetric_fusionnet.py:132-145``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# points per W-build/matmul sub-tile and sub-tiles per grid step. Grid-step
# overhead on TPU is ~10-15 us; the inner fori_loop amortizes it 8x.
_TILE_N = 256
_SUPER = 8  # 16+ exceeds the 16 MB scoped-vmem limit (out block scales with it)
_BLOCK_N = _TILE_N * _SUPER
# Source band lattice: _band_rows y-rows x _XB columns (both multiples of
# the bf16 sublane tile, so the 2-D dynamic band slice stays tile-aligned).
# Band spans per sub-tile are computed over LIVE TAPS ONLY (points whose
# bilinear taps can touch the image); without that masking a single stray
# point — in front of the camera but projecting outside the image, clipped
# at +-2*w pixels — stretched the span over the whole lattice. Each live
# y-segment additionally computes its own x-span (a voxel z-column's
# projections cluster tightly in x within one image row band).
def _band_rows(h: int) -> int:
    return 16


_XB = 16  # x-band columns (lattice width)


def _pad_cols(w: int) -> int:
    return -(-w // _XB) * _XB


def _pix_taps(coords: jnp.ndarray, h: int, w: int, row0_idx, n_valid: int,
              sb: int, raw: bool = False):
    """Pixel-space tap data for one sub-tile.

    Returns (ix0, iy0 [tile, 1] int32 floor taps — DEAD points (non-finite
    / sanitized out of FOV / rows past ``n_valid``) carry a -(1<<20)
    sentinel so they match no band window and drop out of every span;
    wx, ty [tile, 1] bf16 fracs; fx32, fy32 [tile, 1] f32 fracs (nearest
    picks compare the f32 frac — bf16 rounds ~0.5002 onto 0.5); lat_y,
    n_seg_y the y-lattice origin and dynamic segment count).

    raw: coords are CAMERA-PLANE points (u, v, z) and the perspective
    divide, NaN/overflow handling, in-front and in-bounds sanitize all run
    here on VMEM vectors — replacing ~6 ms/step of XLA elementwise passes
    over the [cams, N, 2-3] coordinate streams at DDAD shapes (the same
    semantics as vfnet._project_voxel_coords: +1e-8 divide guard,
    nan -> +2w, clip to +-2w, dead unless z > 0 and the ALIGN-CORNERS
    pixel lies in [0, w-1] x [0, h-1])."""
    if raw:
        zp = coords[:, 2] + 1e-8
        x = coords[:, 0] / zp
        y = coords[:, 1] / zp
        big = 2.0 * w
        x = jnp.where(jnp.isnan(x), big, x)
        y = jnp.where(jnp.isnan(y), big, y)
        x = jnp.clip(x, -big, big)
        y = jnp.clip(y, -big, big)
        live = ((coords[:, 2] > 0) & (x >= 0) & (x <= w - 1.0)
                & (y >= 0) & (y <= h - 1.0))
        x = jnp.where(live, x, -4.0)
        y = jnp.where(live, y, -4.0)
    else:
        finite = jnp.isfinite(coords[:, 0]) & jnp.isfinite(coords[:, 1])
        x = jnp.where(finite, (coords[:, 0] + 1.0) * (0.5 * (w - 1)), -4.0)
        y = jnp.where(finite, (coords[:, 1] + 1.0) * (0.5 * (h - 1)), -4.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx32 = (x - x0)[:, None]
    fy32 = (y - y0)[:, None]
    wx = fx32.astype(jnp.bfloat16)
    ty = fy32.astype(jnp.bfloat16)
    ix0 = x0.astype(jnp.int32)[:, None]
    iy0 = y0.astype(jnp.int32)[:, None]

    # live-tap mask: a point contributes nothing unless both its x taps and
    # y taps can land in-image (ix0 in [-1, w-1], iy0 in [-1, h-1]); rows
    # past the true point count (the grid need not divide n; the partial
    # last block reads undefined coords there) are dead too.
    tile = coords.shape[0]
    row = (jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + row0_idx)
    alive = ((ix0 >= -1) & (ix0 <= w - 1)
             & (iy0 >= -1) & (iy0 <= h - 1) & (row < n_valid))
    dead = jnp.int32(-(1 << 20))
    ix0 = jnp.where(alive, ix0, dead)
    iy0 = jnp.where(alive, iy0, dead)

    lo = jnp.clip(jnp.min(jnp.where(alive, iy0, h)), -1, h)
    hi = jnp.clip(jnp.max(jnp.where(alive, iy0, -2)) + 2, -1, h + 1)
    lat = jnp.maximum((lo // sb) * sb, 0)
    n_seg = jnp.maximum((jnp.minimum(hi, h) - lat + sb - 1) // sb, 0)
    return ix0, iy0, wx, ty, fx32, fy32, lat, n_seg


def _xspan(ix0, iy0, y0, sb, w):
    """x-lattice origin + dynamic window count for ONE y-segment: the span
    of ix0 over points whose taps touch rows [y0, y0+sb) (iy0 in
    [y0-1, y0+sb-1]; dead sentinels fail the lower test)."""
    in_seg = (iy0 >= y0 - 1) & (iy0 < y0 + sb)
    xlo = jnp.min(jnp.where(in_seg, ix0, w))
    xhi = jnp.max(jnp.where(in_seg, ix0, -2)) + 2
    lat_x = jnp.maximum((xlo // _XB) * _XB, 0)
    n_x = jnp.maximum((jnp.minimum(xhi, w) - lat_x + _XB - 1) // _XB, 0)
    return lat_x, n_x


def _ohx_window(ix0, wx, x0, xb, transpose=False):
    """Bilinear x one-hot over window columns [x0, x0+xb):
    [tile, xb] (or transposed [xb, tile]). Taps outside the window never
    match (each tap column belongs to exactly one lattice window); a tap
    at column w on a padded image hits a zero column (zeros-padding
    semantics preserved)."""
    tile = ix0.shape[0]
    one = jnp.bfloat16(1.0)
    if transpose:
        iox = jax.lax.broadcasted_iota(jnp.int32, (xb, tile), 0) + x0
        ix0, wx = ix0.T, wx.T
    else:
        iox = jax.lax.broadcasted_iota(jnp.int32, (tile, xb), 1) + x0
    return ((iox == ix0).astype(jnp.bfloat16) * (one - wx)
            + (iox == ix0 + 1).astype(jnp.bfloat16) * wx)


def _wy_window(iy0, ty, y0, h, sb, xb, transpose=False):
    """Band y-weight factor over the FLAT [sb*xb] window: [tile, sb*xb]
    (or transposed). Row block r covers flat window indices
    [r*xb, (r+1)*xb); tap rows iy0 (weight 1-ty) and iy0+1 (weight ty)
    match via range tests, with taps >= h invalidated (taps < 0 and dead
    sentinels can never match: the window row index is >= 0)."""
    one = jnp.bfloat16(1.0)
    big = jnp.int32(1 << 24)
    top = jnp.minimum(y0 + sb, h)
    r0 = jnp.where((iy0 >= y0) & (iy0 < top), (iy0 - y0) * xb, big)
    iy1 = iy0 + 1
    r1 = jnp.where((iy1 >= y0) & (iy1 < top), (iy1 - y0) * xb, big)
    tile = iy0.shape[0]
    if transpose:
        iop = jax.lax.broadcasted_iota(jnp.int32, (sb * xb, tile), 0)
        r0, r1, ty = r0.T, r1.T, ty.T
    else:
        iop = jax.lax.broadcasted_iota(jnp.int32, (tile, sb * xb), 1)
    row0 = ((iop >= r0) & (iop < r0 + xb))
    row1 = ((iop >= r1) & (iop < r1 + xb))
    return (row0.astype(jnp.bfloat16) * (one - ty)
            + row1.astype(jnp.bfloat16) * ty)


def _fwd_kernel(h: int, w: int, sb: int, with_mask: bool, fold_valid: bool,
                n_valid: int, grouped: bool, raw: bool, rel_scale: float,
                img_ref, coords_ref, *rest):
    """img (bf16) [h*w, C]; coords [BLOCK_N, 2(+1)]; out [BLOCK_N, C(+1|+2)].

    raw: coords are camera-plane (u, v, z) — the perspective divide +
    sanitize run in-kernel (see _pix_taps) and the rel-depth epilogue
    column is z * rel_scale instead of a precomputed third column.

    with_mask: an extra input mask2d (bf16) [h_pad, w] is NEAREST-sampled
    through the same taps (rounded per-axis one-hots) into the LAST output
    channel — replaces a separate 2.4M-scalar-row XLA gather in the
    back-projection validity test.

    fold_valid (implies with_mask): coords carry a third per-point column
    (the rel-depth feature) and the output is the back-projection's entire
    per-point epilogue — [feat * valid, rel * valid, valid] with
    valid = nearest_mask > 0.5 — folding what was ~10 ms/step of
    [cams, 200k, C]-sized XLA elementwise passes (mask select, rel-depth
    concat, validity broadcast) into the kernel's VMEM epilogue. Callers
    must pre-sanitize coords of points they consider invalid (behind camera
    / out of NDC bounds) out of tap range; the kernel then reproduces
    ``feat_cat * valid`` of vfnet.backproject_into_voxel bit-for-bit.

    grouped (implies fold_valid): the grid carries a trailing camera axis
    (innermost, so consecutive steps revisit the same out block) and the
    per-point epilogue row ACCUMULATES into the out block — the static
    camera-group sums consumed by fuse_depth/pose (the only way the
    per-camera features are ever read) are formed here, so the
    [cams, N, C]-sized per-camera tensor and its backward cotangent never
    exist in HBM. bf16 += matches the old caller-side group-sum numerics.
    A second PER-CAMERA output [BLOCK_N, 1] records each point's validity
    (written per camera step, not accumulated) — the backward's gate, so
    it needs no in-kernel mask re-sampling."""
    valid_ref = None
    if grouped:
        mask_ref, out_ref, valid_ref = rest
    elif with_mask:
        mask_ref, out_ref = rest
    else:
        (out_ref,) = rest
    c = out_ref.shape[-1] - ((2 if fold_valid else 1) if with_mask else 0)

    blk = pl.program_id(2 if grouped else 1)
    # hoisted: program_id is unavailable inside nested (fori_loop) jaxprs
    # under the CPU HLO interpreter
    cam = pl.program_id(3) if grouped else None

    def body(k, _):
        sl = pl.ds(k * _TILE_N, _TILE_N)
        coords = coords_ref[sl, :]
        ix0, iy0, wx, ty, fx32, fy32, lat, n_seg = _pix_taps(
            coords, h, w, blk * _BLOCK_N + k * _TILE_N, n_valid, sb, raw=raw)
        if with_mask:
            # nearest x one-hot over the FULL width (the single mask
            # channel stays separable per y-segment — a lane-dim x window
            # on the rank-2 mask ref is not sliceable, and one [tile, w]
            # matmul per y-segment is cheap); the pick compares f32 fracs
            iox = jax.lax.broadcasted_iota(jnp.int32, (_TILE_N, w), 1)
            pxn = (fx32 > 0.5).astype(jnp.bfloat16)
            one = jnp.bfloat16(1.0)
            ohx_n = ((iox == ix0).astype(jnp.bfloat16) * (one - pxn)
                     + (iox == ix0 + 1).astype(jnp.bfloat16) * pxn)
            big = jnp.int32(1 << 24)
            iy0v = jnp.where((iy0 >= 0) & (iy0 < h), iy0, big)
            iy1v = jnp.where((iy0 >= -1) & (iy0 + 1 < h), iy0 + 1, big)
            pyn = (fy32 > 0.5).astype(jnp.float32)
            ior_sb = jax.lax.broadcasted_iota(
                jnp.int32, (_TILE_N, sb), 1)

        def yseg(s, carry):
            acc_f, acc_m = carry
            y0 = pl.multiple_of(lat + s * sb, sb)
            if with_mask:
                mband = mask_ref[pl.ds(y0, sb), :]     # [sb, w]
                tmp = jax.lax.dot_general(
                    ohx_n, mband, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [tile, SB]
                ryn = ((ior_sb == iy0v - y0).astype(jnp.float32)
                       * (1.0 - pyn)
                       + (ior_sb == iy1v - y0).astype(jnp.float32) * pyn)
                acc_m = acc_m + jnp.sum(tmp * ryn, axis=1, keepdims=True)
            lat_x, n_x = _xspan(ix0, iy0, y0, sb, w)

            def xseg(t, acc):
                x0 = pl.multiple_of(lat_x + t * _XB, _XB)
                w_mat = (pltpu.repeat(_ohx_window(ix0, wx, x0, _XB),
                                      sb, axis=1)
                         * _wy_window(iy0, ty, y0, h, sb, _XB))
                band = img_ref[pl.ds(y0, sb), pl.ds(x0, _XB), :]
                return acc + jnp.dot(w_mat, band.reshape(sb * _XB, c),
                                     preferred_element_type=jnp.float32)

            acc_f = jax.lax.fori_loop(0, n_x, xseg, acc_f)
            return acc_f, acc_m

        acc_f, acc_m = jax.lax.fori_loop(
            0, n_seg, yseg,
            (jnp.zeros((_TILE_N, c), jnp.float32),
             jnp.zeros((_TILE_N, 1), jnp.float32)))
        acc = (jnp.concatenate([acc_f, acc_m], axis=1) if with_mask
               else acc_f)
        if fold_valid:
            valid = (acc[:, c:c + 1] > 0.5).astype(jnp.float32)
            rel = (coords[:, 2:3] * rel_scale) if raw else coords[:, 2:3]
            acc = jnp.concatenate(
                [acc[:, :c] * valid, rel * valid, valid], axis=1)
        if grouped:
            row = acc.astype(out_ref.dtype)
            valid_ref[sl, :] = valid.astype(valid_ref.dtype)

            @pl.when(cam == 0)
            def _():
                out_ref[sl, :] = row

            @pl.when(cam != 0)
            def _():
                out_ref[sl, :] += row
        else:
            out_ref[sl, :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, _SUPER, body, 0)


def _bwd_kernel(h: int, w: int, sb: int, n_valid: int, with_valid: bool,
                raw: bool, g_ref, coords_ref, *rest):
    """g [BLOCK_N, Cb]; out (bf16) [hp, wp, Cb]; acc (f32 scratch) same.

    Grid is (b, c_chunks, n_tiles): wide-C calls are chunked by the GRID
    (BlockSpecs slice the channel axis) instead of by the caller — the
    caller-side g slices materialized a full extra copy of g (~3.7 ms/step
    at DDAD shapes). The accumulator lives in single-buffered scratch
    (persists across the sequential tile axis; reset at tile 0, flushed at
    the last tile); the pipelined output block only receives the final
    value, halving peak VMEM vs accumulating in the (double-buffered)
    output. The transposed W is built per (y, x) band and accumulated into
    the band's [sb, _XB] window only — a dim-0-contraction with a
    full-height W made Mosaic emit a 2 MB transpose per sub-tile before
    this.

    with_valid: an extra [BLOCK_N, 1] bf16 input gates g rows (the
    back-projection's per-point validity — folding it here replaces a
    [cams, N, C]-sized XLA elementwise pass)."""
    if with_valid:
        valid_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    step = pl.program_id(2)

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    blk = step

    def body(k, _):
        sl = pl.ds(k * _TILE_N, _TILE_N)
        coords = coords_ref[sl, :]
        ix0, iy0, wx, ty, _, _, lat, n_seg = _pix_taps(
            coords, h, w, blk * _BLOCK_N + k * _TILE_N, n_valid, sb, raw=raw)
        # the undefined tail rows of g AND valid (out-of-bounds block reads
        # past n_valid) can be NaN: 0-weight x NaN = NaN in the dot, and one
        # NaN row poisons the whole accumulator through the contraction —
        # zero BOTH explicitly (the tap sentinels only zero W's columns;
        # the where on g alone is not enough: a garbage-NaN valid tail
        # re-poisons it through the multiply)
        row = (jax.lax.broadcasted_iota(jnp.int32, (_TILE_N, 1), 0)
               + blk * _BLOCK_N + k * _TILE_N)
        ok = (row < n_valid)
        g = jnp.where(ok, g_ref[sl, :], 0)
        if with_valid:
            g = g * jnp.where(ok, valid_ref[sl, :], 0)

        def yseg(s, _):
            y0 = pl.multiple_of(lat + s * sb, sb)
            lat_x, n_x = _xspan(ix0, iy0, y0, sb, w)

            def xseg(t, _2):
                x0 = pl.multiple_of(lat_x + t * _XB, _XB)
                w_t = (pltpu.repeat(
                           _ohx_window(ix0, wx, x0, _XB, transpose=True),
                           sb, axis=0)
                       * _wy_window(iy0, ty, y0, h, sb, _XB, transpose=True))
                upd = jnp.dot(w_t, g, preferred_element_type=jnp.float32)
                acc_ref[pl.ds(y0, sb), pl.ds(x0, _XB), :] += upd.reshape(
                    sb, _XB, g.shape[-1])
                return 0

            jax.lax.fori_loop(0, n_x, xseg, 0)
            return 0

        jax.lax.fori_loop(0, n_seg, yseg, 0)
        return 0

    jax.lax.fori_loop(0, _SUPER, body, 0)

    @pl.when(step == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _pad_rows(h: int) -> int:
    return -(-h // _band_rows(h)) * _band_rows(h)


def _fwd_call(img_flat: jnp.ndarray, coords: jnp.ndarray, h: int, w: int,
              mask2d=None, fold_valid: bool = False, raw: bool = False,
              rel_scale: float = 1.0):
    """img_flat [B, h*w, C]; coords [B, N, 2] (3 cols when fold_valid: the
    third is the per-point rel-depth passthrough); optional mask2d [B, h, w]
    -> [B, N, C (+1 nearest mask | +2 rel*valid, valid)]."""
    b, hw, c = img_flat.shape
    n = coords.shape[1]
    ncols = coords.shape[-1]
    n_tiles = -(-n // _BLOCK_N)      # grid need not divide n (tail masked)
    with_mask = mask2d is not None

    # pad source rows/cols to the 2-D band lattice (taps >= h are
    # sentinel-dead; padded columns are zeros, preserving zeros-padding
    # semantics for the tap at column w)
    hp, wp = _pad_rows(h), _pad_cols(w)
    img4 = img_flat.reshape(b, h, w, c)
    if (hp, wp) != (h, w):
        img4 = jnp.pad(img4, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    # cast outside the kernel: a separate f32 source + bf16 copy inside VMEM
    # was the difference between fitting and a scoped-vmem OOM
    img4 = img4.astype(jnp.bfloat16)
    in_specs = [
        pl.BlockSpec((None, hp, wp, c), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, _BLOCK_N, ncols), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [img4, coords]
    if with_mask:
        hr = _pad_rows(h)
        if hr != h:
            mask2d = jnp.pad(mask2d, ((0, 0), (0, hr - h), (0, 0)))
        args.append(mask2d.astype(jnp.bfloat16))
        in_specs.append(pl.BlockSpec((None, hr, w), lambda i, j: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    co = c + ((2 if fold_valid else 1) if with_mask else 0)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h, w, _band_rows(h), with_mask,
                          fold_valid, n, False, raw, rel_scale),
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, _BLOCK_N, co), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, co), jnp.bfloat16),
        interpret=(jax.default_backend() != "tpu"),
    )(*args)


def _fwd_call_grouped(img_flat: jnp.ndarray, coords3: jnp.ndarray,
                      mask2d: jnp.ndarray, h: int, w: int, b: int, gs: int,
                      raw: bool = False, rel_scale: float = 1.0):
    """Group-reduced fused back-projection forward.

    img_flat [b*2*gs, h*w, C] with cameras PRE-ORDERED group-major
    (group 0's gs cameras, then group 1's); coords3 [b*2*gs, N, 3]
    (x, y normalized + rel-depth, invalid points pre-sanitized); mask2d
    [b*2*gs, h, w]. Returns ([b, 2, N, C+2], [b*2*gs, N, 1]): the
    per-point epilogue [feat*valid, rel*valid, valid] SUMMED over each
    group's cameras — the camera axis never exists in HBM for the
    FEATURES (see _fwd_kernel grouped) — plus the tiny per-camera
    validity written for the backward's gate."""
    bc, hw, c = img_flat.shape
    n = coords3.shape[1]
    n_tiles = -(-n // _BLOCK_N)

    hp, wp = _pad_rows(h), _pad_cols(w)
    img4 = img_flat.reshape(bc, h, w, c)
    if (hp, wp) != (h, w):
        img4 = jnp.pad(img4, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    img4 = img4.astype(jnp.bfloat16)
    hr = _pad_rows(h)
    if hr != h:
        mask2d = jnp.pad(mask2d, ((0, 0), (0, hr - h), (0, 0)))
    mask2d = mask2d.astype(jnp.bfloat16)

    co = c + 2
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h, w, _band_rows(h), True, True, n,
                          True, raw, rel_scale),
        # camera innermost: consecutive steps revisit the (i, g, j) out
        # block, which is what makes the in-kernel accumulation legal
        grid=(b, 2, n_tiles, gs),
        in_specs=[
            pl.BlockSpec((None, hp, wp, c),
                         lambda i, g, j, k: ((i * 2 + g) * gs + k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _BLOCK_N, 3),
                         lambda i, g, j, k: ((i * 2 + g) * gs + k, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hr, w),
                         lambda i, g, j, k: ((i * 2 + g) * gs + k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, None, _BLOCK_N, co),
                         lambda i, g, j, k: (i, g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _BLOCK_N, 1),
                         lambda i, g, j, k: ((i * 2 + g) * gs + k, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2, n, co), jnp.bfloat16),
            jax.ShapeDtypeStruct((b * 2 * gs, n, 1), jnp.bfloat16),
        ],
        # the camera-innermost grid double-buffers the [hp, C] feature-map
        # block (it changes every step), pushing past the 16 MB scoped
        # default at DDAD merged shapes (~20.3 MB); v5e VMEM is 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=(jax.default_backend() != "tpu"),
    )(img4, coords3, mask2d)


def _bwd_call(g: jnp.ndarray, coords: jnp.ndarray, h: int, w: int,
              c: int | None = None, valid: jnp.ndarray | None = None,
              group_size: int = 0, n_valid: int | None = None,
              raw: bool = False):
    """g [B, N, C_in] -> dimg_flat [B, h*w, c] (c defaults to C_in; pass
    c < C_in to ignore trailing cotangent columns — e.g. the fused
    back-projection's rel-depth/valid passthrough channels).

    C is chunked at 256 *by the grid* (a channel axis in the BlockSpecs):
    the kernel's scoped-VMEM footprint (f32 accumulator scratch + per-band
    dot temporaries) scales with the chunk width and exceeds the 16 MB
    scoped limit near C=512 at DDAD shapes. The W-build re-runs per chunk
    (cheap, C-independent); rows/MACs are unchanged, and no caller-side g
    slice/copy is materialized.

    valid [B, N]: optional per-point gate multiplied into g in-kernel.

    group_size > 0: grouped mode — g is the GROUP-sum cotangent
    [b, 2, N, C_in] (cameras pre-ordered group-major, B = b * 2 *
    group_size flattened cameras in coords/valid); each camera reads its
    group's g block, gated by its own validity."""
    gs = group_size
    if gs:
        bb, _, n, c_in = g.shape
        b = bb * 2 * gs
    else:
        b, n, c_in = g.shape
    if c is None:
        c = c_in
    hp, wp = _pad_rows(h), _pad_cols(w)
    # Channel chunk width: every chunk re-runs the WHOLE kernel body — tap
    # prep, the dynamic band loops, the one-hot W builds and the f32 scratch
    # read-modify-write all scale with the chunk count while the MAC total
    # is chunk-invariant. So take the widest lane-aligned chunk whose VMEM
    # footprint (f32 accumulator scratch + double-buffered g/out blocks)
    # fits a 48 MB scoped budget (v5e VMEM is 128 MB; the default 16 MB
    # limit is raised via compiler_params below, as the grouped forward
    # already does). At DDAD merged shapes (c = 768, 48x80 maps) this runs
    # ONE chunk instead of three.
    def _fits(width):
        return (hp * wp * width * 4                 # f32 scratch
                + 2 * _BLOCK_N * width * 2          # g block (double-buffered)
                + 2 * hp * wp * width * 2) <= 48 * 1024 * 1024
    cb = min(c, 256)
    if c % 128 == 0 and _fits(c):
        cb = c
    if cb % 128 != 0 and cb != c_in:
        # Mosaic lane rule: a block's last dim must be a multiple of 128 or
        # equal the array's. A truncating chunk (c < c_in) that is not
        # lane-aligned (small test shapes) must cover the full width; the
        # extra trailing columns are computed and sliced off below.
        cb = c_in
    n_cc = -(-c // cb)               # channel chunks (block-padded if ragged)
    n_tiles = -(-n // _BLOCK_N)      # grid need not divide n (tail masked)

    g = g.astype(jnp.bfloat16)  # halves the VMEM block (accumulator stays f32)
    if gs:
        g_spec = pl.BlockSpec(
            (None, None, _BLOCK_N, cb),
            lambda i, k, j: (i // (2 * gs), (i % (2 * gs)) // gs, j, k),
            memory_space=pltpu.VMEM)
    else:
        g_spec = pl.BlockSpec((None, _BLOCK_N, cb), lambda i, k, j: (i, j, k),
                              memory_space=pltpu.VMEM)
    in_specs = [
        g_spec,
        pl.BlockSpec((None, _BLOCK_N, coords.shape[-1]),
                     lambda i, k, j: (i, j, 0), memory_space=pltpu.VMEM),
    ]
    args = [g, coords]
    if valid is not None:
        args.append(valid[..., None].astype(jnp.bfloat16))
        in_specs.append(
            pl.BlockSpec((None, _BLOCK_N, 1), lambda i, k, j: (i, j, 0),
                         memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, h, w, _band_rows(h),
                          n if n_valid is None else n_valid,
                          valid is not None, raw),
        grid=(b, n_cc, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, hp, wp, cb),
                               lambda i, k, j: (i, 0, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, n_cc * cb), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((hp, wp, cb), jnp.float32)],
        interpret=(jax.default_backend() != "tpu"),
    )(*args)
    # strip lattice padding; callers consume a flat [B, h*w, c] cotangent
    if (hp, wp) != (h, w) or n_cc * cb != c:
        out = out[:, :h, :w, :c]
    return out.reshape(b, h * w, c)


@jax.custom_vjp
def _pallas_sample(img: jnp.ndarray, coords: jnp.ndarray):
    h, w = img.shape[-3], img.shape[-2]
    img_flat = img.reshape(img.shape[0], h * w, img.shape[-1])
    # kernel emits bf16 (taps/matmuls are bf16 anyway; halves the VMEM
    # out-block, which was a 292KB scoped-vmem OOM); promote at the boundary
    return _fwd_call(img_flat, coords, h, w).astype(img.dtype)


def _pallas_sample_fwd(img, coords):
    out = _pallas_sample(img, coords)
    return out, (coords, img.shape)


def _pallas_sample_bwd(res, g):
    coords, img_shape = res
    h, w = img_shape[-3], img_shape[-2]
    dimg_flat = _bwd_call(g, coords, h, w)
    return dimg_flat.reshape(img_shape).astype(g.dtype), jnp.zeros_like(coords)


_pallas_sample.defvjp(_pallas_sample_fwd, _pallas_sample_bwd)


@jax.custom_vjp
def _pallas_sample_masked(img: jnp.ndarray, mask: jnp.ndarray,
                          coords: jnp.ndarray):
    h, w = img.shape[-3], img.shape[-2]
    img_flat = img.reshape(img.shape[0], h * w, img.shape[-1])
    return _fwd_call(img_flat, coords, h, w,
                     mask2d=mask[..., 0]).astype(img.dtype)


def _pallas_sample_masked_fwd(img, mask, coords):
    out = _pallas_sample_masked(img, mask, coords)
    return out, (coords, img.shape, mask.shape)


def _pallas_sample_masked_bwd(res, g):
    coords, img_shape, mask_shape = res
    h, w = img_shape[-3], img_shape[-2]
    # the nearest mask channel carries no gradient (validity is a
    # stop-gradient input in the reference, volumetric_fusionnet.py:183-195)
    dimg_flat = _bwd_call(g, coords, h, w, c=img_shape[-1])
    return (dimg_flat.reshape(img_shape).astype(g.dtype),
            jnp.zeros(mask_shape, g.dtype), jnp.zeros_like(coords))


_pallas_sample_masked.defvjp(_pallas_sample_masked_fwd,
                             _pallas_sample_masked_bwd)


def sample_bilinear_pallas(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample via the banded Pallas one-hot-matmul kernel.

    Args:
      img: [B, H, W, C] small source (H*W*C must fit VMEM, <= ~4 MB;
        H a multiple of 16).
      coords: [B, N, 2] normalized (x, y), align_corners=True.
    Returns [B, N, C]; gradient flows to img only.
    """
    return _pallas_sample(img, coords)


def sample_bilinear_with_nearest_mask_pallas(
        img: jnp.ndarray, mask: jnp.ndarray,
        coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear feature sample + NEAREST mask sample in one kernel pass.

    img: [B, H, W, C]; mask: [B, H, W, 1]; coords as above. Returns
    [B, N, C+1] — last channel is the nearest-sampled mask (no gradient).
    """
    return _pallas_sample_masked(img, mask, coords)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_backproject(img, mask, coords3, raw=False, rel_scale=1.0):
    h, w = img.shape[-3], img.shape[-2]
    img_flat = img.reshape(img.shape[0], h * w, img.shape[-1])
    fm = _fwd_call(img_flat, coords3, h, w, mask2d=mask[..., 0],
                   fold_valid=True, raw=raw,
                   rel_scale=rel_scale).astype(img.dtype)
    # split INSIDE the custom_vjp: a caller-side `fm[..., :-1]` slice makes
    # XLA pad the cotangent back to C+2 with a full [cams, N, C+2] pass
    # (~7 ms/step at DDAD shapes); as separate outputs the backward consumes
    # the feature cotangent directly.
    return fm[..., :-1], fm[..., -1]


def _pallas_backproject_fwd(img, mask, coords3, raw, rel_scale):
    feat, valid = _pallas_backproject(img, mask, coords3, raw, rel_scale)
    # valid (exact bf16 0/1) gates the backward: dL/dimg = W^T (g * valid)
    return (feat, valid), (coords3, valid, img.shape, mask.shape)


def _pallas_backproject_bwd(raw, rel_scale, res, g):
    coords3, valid, img_shape, mask_shape = res
    g_feat, _ = g        # valid is stop-gradient at every caller
    h, w = img_shape[-3], img_shape[-2]
    c = img_shape[-1]
    # only the feature channels carry image gradient; the rel channel is an
    # input passthrough (no parameters behind it). The valid gate and the
    # channel truncation both happen inside the kernel — no [cams, N, C]
    # caller-side pass. Raw mode keeps all 3 coord columns (the in-kernel
    # perspective divide needs z).
    dimg_flat = _bwd_call(g_feat, coords3 if raw else coords3[..., :2],
                          h, w, c=c, valid=valid, raw=raw)
    return (dimg_flat.reshape(img_shape).astype(g_feat.dtype),
            jnp.zeros(mask_shape, g_feat.dtype), jnp.zeros_like(coords3))


_pallas_backproject.defvjp(_pallas_backproject_fwd, _pallas_backproject_bwd)


def sample_backproject_pallas(img: jnp.ndarray, mask: jnp.ndarray,
                              coords: jnp.ndarray,
                              rel: jnp.ndarray) -> jnp.ndarray:
    """The back-projection sampling stage with its per-point epilogue fused.

    img: [B, H, W, C]; mask: [B, H, W, 1]; coords: [B, N, 2] normalized,
    with invalid points (behind camera / out of bounds) pre-sanitized out of
    tap range by the caller; rel: [B, N] per-point rel-depth feature.

    Returns ([B, N, C+1], [B, N]) = ([feat * valid, rel * valid], valid)
    where valid = nearest-sampled mask > 0.5 (exactly the masked feature
    tensor of ``VFNet.backproject_into_voxel``, reference
    ``network/volumetric_fusionnet.py:183-195``). Gradient flows to img only.
    """
    coords3 = jnp.concatenate(
        [coords, rel[..., None].astype(coords.dtype)], axis=-1)
    return _pallas_backproject(img, mask, coords3, False, 1.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _pallas_backproject_grouped(img, mask, coords3, b, gs, raw=False,
                                rel_scale=1.0):
    h, w = img.shape[-3], img.shape[-2]
    img_flat = img.reshape(img.shape[0], h * w, img.shape[-1])
    fm, _ = _fwd_call_grouped(img_flat, coords3, mask[..., 0], h, w, b, gs,
                              raw=raw, rel_scale=rel_scale)
    fm = fm.astype(img.dtype)
    # split INSIDE the custom_vjp (see _pallas_backproject): the backward
    # consumes the feature cotangent directly, no pad-back pass
    return fm[..., :-1], fm[..., -1]


def _pallas_backproject_grouped_fwd(img, mask, coords3, b, gs, raw,
                                    rel_scale):
    h, w = img.shape[-3], img.shape[-2]
    img_flat = img.reshape(img.shape[0], h * w, img.shape[-1])
    fm, valid_pc = _fwd_call_grouped(img_flat, coords3, mask[..., 0], h, w,
                                     b, gs, raw=raw, rel_scale=rel_scale)
    fm = fm.astype(img.dtype)
    return ((fm[..., :-1], fm[..., -1]),
            (coords3, valid_pc, mask.shape, img.shape))


def _pallas_backproject_grouped_bwd(b, gs, raw, rel_scale, res, g):
    coords3, valid_pc, mask_shape, img_shape = res
    g_feat, _ = g        # the count channel is stop-gradient at every caller
    h, w = img_shape[-3], img_shape[-2]
    c = img_shape[-1]
    # each camera reads its GROUP's cotangent block, gated by its own
    # validity (the tiny per-camera [B, N] output of the forward kernel)
    dimg_flat = _bwd_call(g_feat, coords3 if raw else coords3[..., :2],
                          h, w, c=c, valid=valid_pc[..., 0], group_size=gs,
                          raw=raw)
    return (dimg_flat.reshape(img_shape).astype(g_feat.dtype),
            jnp.zeros(mask_shape, g_feat.dtype), jnp.zeros_like(coords3))


_pallas_backproject_grouped.defvjp(_pallas_backproject_grouped_fwd,
                                   _pallas_backproject_grouped_bwd)


def sample_backproject_grouped_pallas(
        img: jnp.ndarray, mask: jnp.ndarray, coords: jnp.ndarray,
        rel: jnp.ndarray, batch: int, group_size: int):
    """Fused back-projection with the camera axis reduced IN-KERNEL into two
    static camera-group sums (``VFNet.fuse_depth``'s {0,3,4}/{1,2,5} groups
    — the only way the per-camera features are ever consumed; reference
    ``network/volumetric_fusionnet.py:154-162, 209-230``).

    img: [batch*2*group_size, H, W, C] with cameras PRE-ORDERED group-major;
    mask: [same, H, W, 1]; coords: [same, N, 2] normalized (invalid points
    pre-sanitized out of tap range); rel: [same, N].

    Returns ([batch, 2, N, C+1], [batch, 2, N]) = group sums of
    ([feat*valid, rel*valid], valid) — the second output's group sum over
    axis 1 is the visibility count. The [cams, N, C] per-camera tensor and
    its backward cotangent never exist in HBM (~20 ms/step of [6, 200k,
    770]-sized streams at DDAD shapes); the forward emits each camera's
    tiny per-point validity as a side output, which gates that camera's
    read of its group's cotangent in the backward. Gradient flows to img
    only. bf16 in-kernel accumulation matches the caller-side group-sum
    numerics of the ungrouped path."""
    coords3 = jnp.concatenate(
        [coords, rel[..., None].astype(coords.dtype)], axis=-1)
    return _pallas_backproject_grouped(img, mask, coords3, batch,
                                       group_size, False, 1.0)


def sample_backproject_raw_pallas(img: jnp.ndarray, mask: jnp.ndarray,
                                  cam_pts: jnp.ndarray, rel_scale: float):
    """``sample_backproject_pallas`` taking CAMERA-PLANE points directly.

    cam_pts: [B, N, 3] = K[:3, :] @ (E^-1 @ voxel), i.e. (u, v, z) BEFORE
    the perspective divide. The divide, nan/overflow handling, in-front +
    in-bounds sanitize, and the rel-depth feature (z * rel_scale) all run
    inside the kernel on VMEM vectors — the XLA coordinate epilogue
    (~6 ms/step of [cams, N, 2-3] passes at DDAD shapes) disappears.
    Same outputs/semantics as the normalized-coords form."""
    return _pallas_backproject(img, mask, cam_pts, True, float(rel_scale))


def sample_backproject_grouped_raw_pallas(
        img: jnp.ndarray, mask: jnp.ndarray, cam_pts: jnp.ndarray,
        rel_scale: float, batch: int, group_size: int):
    """``sample_backproject_grouped_pallas`` taking camera-plane points
    (see ``sample_backproject_raw_pallas``)."""
    return _pallas_backproject_grouped(img, mask, cam_pts, batch,
                                       group_size, True, float(rel_scale))
