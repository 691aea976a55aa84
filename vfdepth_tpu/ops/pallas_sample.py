"""Pallas TPU kernels: bilinear sampling as banded in-VMEM one-hot matmuls.

The hot op of voxel back-projection — sample a small fusion-level feature map
(48x80) at ~200k projected voxel centers per camera — is pathological for
XLA on TPU (gather fwd ~61 ms, scatter-add bwd ~120 ms with minutes-long
compiles; measured v5e). These kernels express both directions as MXU
matmuls against a 4-tap one-hot weight matrix that is built *inside* the
kernel and never leaves VMEM:

  forward : out[n, c]  = W[n, band] @ img[band, c]   (summed over y-bands)
  backward: dimg[p, c] = W[band, n]^T @ g[n, c]      (accumulated over tiles)

The weight matrix is built per *y-band* of ``_SB`` source rows rather than
over the whole image: voxel points are [z, y, x]-ordered, so a 256-point
sub-tile projects into a narrow image band and the one-hot contraction
shrinks from h*w to _SB*w (3x fewer MACs and W-build ops at 48x80). Bands
live on an aligned lattice with DYNAMIC loop trip counts — fully
out-of-FOV sub-tiles (50-70% of the volume per camera) run zero band
iterations, replacing the previous explicit whole-tile skip.

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
# Source y-band rows (aligned lattice; multiple of the bf16 sublane tile).
# The band span per sub-tile is computed over LIVE TAPS ONLY (points whose
# bilinear taps can touch the image); without that masking a single stray
# point — in front of the camera but projecting outside the image, clipped
# at +-2*w pixels — stretched the span over the whole lattice, which is why
# an earlier 16-row banding experiment lost to whole-image bands. With live
# -tap spans the measured mean is ~1.3 segments of 16 rows per 256-point
# sub-tile on the DDAD rig (~2.3x fewer MACs + W-build ops than the
# whole-image band, on top of the zero-iteration skip for fully
# out-of-FOV sub-tiles).
def _band_rows(h: int) -> int:
    return 16


def _pix_taps(coords: jnp.ndarray, h: int, w: int, sb: int,
              raw: bool = False):
    """Pixel-space tap data for one sub-tile.

    Returns (ohx [tile, w] bf16 2-tap x weights, iy0 [tile, 1] int32 floor
    row, ty [tile, 1] bf16 y frac, y_lo, n_seg) — iy0 is sentinel-free;
    band membership uses the aligned lattice (each tap row belongs to
    exactly one band). Non-finite coords sanitize to -2 normalized (all
    taps dead, zero active bands when a whole sub-tile is out of FOV).

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
        cx = jnp.where(finite, coords[:, 0], -2.0)
        cy = jnp.where(finite, coords[:, 1], -2.0)
        x = (cx + 1.0) * 0.5 * (w - 1)
        y = (cy + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx32 = (x - x0)[:, None]                 # keep f32 for nearest picks:
    fy32 = (y - y0)[:, None]                 # bf16 rounds ~0.5002 ONTO 0.5
    wx = fx32.astype(jnp.bfloat16)
    ty = fy32.astype(jnp.bfloat16)
    ix0 = x0.astype(jnp.int32)[:, None]
    iy0 = y0.astype(jnp.int32)[:, None]

    tile = coords.shape[0]
    iox = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1)
    one = jnp.bfloat16(1.0)
    # iota compares zero out-of-range taps automatically (no match < 0 or >= w)
    m0x = (iox == ix0)
    m1x = (iox == ix0 + 1)
    ohx = (m0x.astype(jnp.bfloat16) * (one - wx)
           + m1x.astype(jnp.bfloat16) * wx)
    # nearest x one-hot (rounded weights; exact NEAREST through the taps;
    # the pick compares the F32 frac — a bf16 frac collapses ties)
    pxn = (fx32 > 0.5).astype(jnp.bfloat16)
    ohx_n = (m0x.astype(jnp.bfloat16) * (one - pxn)
             + m1x.astype(jnp.bfloat16) * pxn)

    # Band span over LIVE taps only: a point contributes nothing unless both
    # its x taps and y taps can land in-image (ix0 in [-1, w-1], iy0 in
    # [-1, h-1]) — excluding dead points from the span is exact, and it is
    # what keeps the span tight (in-front points clipped at +-2*w pixels
    # would otherwise stretch it across the whole lattice).
    alive = ((ix0 >= -1) & (ix0 <= w - 1)
             & (iy0 >= -1) & (iy0 <= h - 1))
    y0a = jnp.where(alive, iy0, h)
    lo = jnp.clip(jnp.min(y0a), -1, h)
    y0b = jnp.where(alive, iy0, -2)
    hi = jnp.clip(jnp.max(y0b) + 2, -1, h + 1)
    lat = jnp.maximum((lo // sb) * sb, 0)
    n_seg = jnp.maximum((jnp.minimum(hi, h) - lat + sb - 1) // sb, 0)
    return ohx, ohx_n, iy0, ty, fy32, lat, n_seg


def _wy_band(iy0, ty, o_kw, tile, w, h, sb, transpose=False):
    """Band y-weight factor: [tile, sb*w] (or transposed [sb*w, tile]).

    Row block r covers flat pixels [o_kw + r*w, o_kw + (r+1)*w); tap rows
    iy0 (weight 1-ty) and iy0+1 (weight ty) match via flat range tests,
    with taps >= h invalidated (taps < 0 can never match: iop >= 0)."""
    one = jnp.bfloat16(1.0)
    big = jnp.int32(1 << 24)
    iy0w = jnp.where(iy0 < h, iy0 * w, big)
    iy1w = jnp.where(iy0 + 1 < h, (iy0 + 1) * w, big)
    if transpose:
        iop = jax.lax.broadcasted_iota(jnp.int32, (sb * w, tile), 0) + o_kw
        iy0w, iy1w, ty = iy0w.T, iy1w.T, ty.T
    else:
        iop = jax.lax.broadcasted_iota(jnp.int32, (tile, sb * w), 1) + o_kw
    row0 = ((iop >= iy0w) & (iop < iy0w + w))
    row1 = ((iop >= iy1w) & (iop < iy1w + w))
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
        ohx, ohx_n, iy0, ty, fy32, lat, n_seg = _pix_taps(coords, h, w, sb,
                                                          raw=raw)
        # zero the rows past the true point count (the grid need not divide
        # n; the partial last block reads undefined coords there)
        row = (jax.lax.broadcasted_iota(jnp.int32, (_TILE_N, 1), 0)
               + blk * _BLOCK_N + k * _TILE_N)
        ok = (row < n_valid).astype(ohx.dtype)
        ohx = ohx * ok
        ohx_n = ohx_n * ok
        ohx_full = pltpu.repeat(ohx, sb, axis=1)       # [tile, sb*w]
        if with_mask:
            big = jnp.int32(1 << 24)
            iy0v = jnp.where(iy0 < h, iy0, big)
            iy1v = jnp.where(iy0 + 1 < h, iy0 + 1, big)
            pyn = (fy32 > 0.5).astype(jnp.bfloat16)
            ior_sb = jax.lax.broadcasted_iota(
                jnp.int32, (_TILE_N, sb), 1)

        def seg(s, acc):
            o_k = pl.multiple_of(lat + s * sb, sb)
            o_kw = pl.multiple_of(o_k * w, sb * w)
            band = img_ref[pl.ds(o_kw, sb * w), :]     # [sb*w, C]
            w_mat = ohx_full * _wy_band(iy0, ty, o_kw, _TILE_N, w, h, sb)
            feat = jnp.dot(w_mat, band, preferred_element_type=jnp.float32)
            if not with_mask:
                return acc + feat
            mband = mask_ref[pl.ds(o_k, sb), :]        # [sb, w]
            # separable nearest for the single mask channel: small matmul
            # over x, then a per-point row pick over the band's _SB rows
            tmp = jax.lax.dot_general(
                ohx_n, mband, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # [tile, SB]
            ryn = ((ior_sb == iy0v - o_k).astype(jnp.float32)
                   * (1.0 - pyn.astype(jnp.float32))
                   + (ior_sb == iy1v - o_k).astype(jnp.float32)
                   * pyn.astype(jnp.float32))
            m_out = jnp.sum(tmp * ryn, axis=1, keepdims=True)
            return acc + jnp.concatenate([feat, m_out], axis=1)

        acc = jax.lax.fori_loop(
            0, n_seg, seg,
            jnp.zeros((_TILE_N, c + (1 if with_mask else 0)), jnp.float32))
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
    """g [BLOCK_N, Cb]; out (bf16) [h*w, Cb]; acc (f32 scratch) [h*w, Cb].

    Grid is (b, c_chunks, n_tiles): wide-C calls are chunked by the GRID
    (BlockSpecs slice the channel axis) instead of by the caller — the
    caller-side g slices materialized a full extra copy of g (~3.7 ms/step
    at DDAD shapes). The accumulator lives in single-buffered scratch
    (persists across the sequential tile axis; reset at tile 0, flushed at
    the last tile); the pipelined output block only receives the final
    value, halving peak VMEM vs accumulating in the (double-buffered)
    output. The transposed W is built band-by-band and accumulated into the
    band's rows only — a dim-0-contraction with a full-height W made Mosaic
    emit a 2 MB transpose per sub-tile before this.

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
        ohx, _, iy0, ty, _, lat, n_seg = _pix_taps(coords, h, w, sb, raw=raw)
        row = (jax.lax.broadcasted_iota(jnp.int32, (_TILE_N, 1), 0)
               + blk * _BLOCK_N + k * _TILE_N)
        ok = (row < n_valid)
        ohx = ohx * ok.astype(ohx.dtype)
        ohx_t_full = pltpu.repeat(ohx.T, sb, axis=0)   # [sb*w, tile]
        # the undefined tail rows of g AND valid (out-of-bounds block reads
        # past n_valid) can be NaN: 0-weight x NaN = NaN in the dot, and one
        # NaN row poisons the whole accumulator through the contraction —
        # zero BOTH explicitly (the where on g alone is not enough: a
        # garbage-NaN valid tail re-poisons it through the multiply)
        g = jnp.where(ok, g_ref[sl, :], 0)
        if with_valid:
            g = g * jnp.where(ok, valid_ref[sl, :], 0)

        def seg(s, _):
            o_kw = pl.multiple_of((lat + s * sb) * w, sb * w)
            w_t = ohx_t_full * _wy_band(iy0, ty, o_kw, _TILE_N, w, h, sb,
                                        transpose=True)
            acc_ref[pl.ds(o_kw, sb * w), :] += jnp.dot(
                w_t, g, preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_seg, seg, 0)
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

    # pad source rows to the band lattice (taps >= h are sentinel-dead,
    # so padding rows are never addressed with nonzero weight)
    hp = _pad_rows(h) * w
    if hp != hw:
        img_flat = jnp.pad(img_flat, ((0, 0), (0, hp - hw), (0, 0)))
    # cast outside the kernel: a separate f32 source + bf16 copy inside VMEM
    # was the difference between fitting and a scoped-vmem OOM
    img_flat = img_flat.astype(jnp.bfloat16)
    in_specs = [
        pl.BlockSpec((None, hp, c), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, _BLOCK_N, ncols), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [img_flat, coords]
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
    _, hw, c = img_flat.shape
    n = coords3.shape[1]
    n_tiles = -(-n // _BLOCK_N)

    hp = _pad_rows(h) * w
    if hp != hw:
        img_flat = jnp.pad(img_flat, ((0, 0), (0, hp - hw), (0, 0)))
    img_flat = img_flat.astype(jnp.bfloat16)
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
            pl.BlockSpec((None, hp, c),
                         lambda i, g, j, k: ((i * 2 + g) * gs + k, 0, 0),
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
    )(img_flat, coords3, mask2d)


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
    cb = min(c, 256)                 # channel chunk width
    if cb % 128 != 0 and cb != c_in:
        # Mosaic lane rule: a block's last dim must be a multiple of 128 or
        # equal the array's. A truncating chunk (c < c_in) that is not
        # lane-aligned (small test shapes) must cover the full width; the
        # extra trailing columns are computed and sliced off below.
        cb = c_in
    n_cc = -(-c // cb)               # channel chunks (block-padded if ragged)
    n_tiles = -(-n // _BLOCK_N)      # grid need not divide n (tail masked)

    g = g.astype(jnp.bfloat16)  # halves the VMEM block (accumulator stays f32)
    hp = _pad_rows(h) * w
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
        out_specs=pl.BlockSpec((None, hp, cb), lambda i, k, j: (i, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, n_cc * cb), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((hp, cb), jnp.float32)],
        interpret=(jax.default_backend() != "tpu"),
    )(*args)
    return out[:, :h * w, :c] if n_cc * cb != c else out[:, :h * w]


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
