"""Full-resolution image warp as windowed one-hot MXU matmuls (Pallas TPU).

The view-synthesis warps are the largest single cost of the training step:
48 full-image (384x640) warps/step whose XLA gather formulation runs at
~40M rows/s regardless of row width (measured v5e; ~300 ms/step fwd+bwd).
This kernel moves the warp onto the MXU:

  * target pixels are processed in flat strips of ``_BLOCK_T`` (row-major),
    256-pixel micro-tiles per one-hot matmul;
  * the y-span of each strip's bilinear taps is covered by 32-row source
    *y-bands* on an aligned lattice; the x-span of each micro-tile by
    256-column *x-windows* — so the matmul contraction is 256 long, not W;
  * per (micro-tile, y-band, x-window) the warp is TWO exact one-hot
    matmuls  t{0,1}[(c,y), p] = src[(c,y), x-window] @ Xoh{0,1}[:, p]
    (floor / ceil x-taps; one-hots hold exact bf16 1.0s) followed by f32
    VPU combines with the bilinear weights — the only quantization vs the
    f32 gather path is bf16 rounding of the *source values* (exact for
    bf16-representable inputs: bf16 x bf16 products are exact in f32);
  * the forward kernel also emits the closed-form coordinate-derivative
    maps d out/d x and d out/d y (reusing the same two matmuls), so the
    custom-VJP backward is a pure XLA elementwise dot with the upstream
    gradient — no second kernel, no gather/scatter anywhere.

Tap semantics match ``ops/warp_quad.py`` exactly: taps at floor/floor+1
with (1-t, t) weights, out-of-image taps contribute zero (zeros-padding),
the mask channel uses per-axis *rounded* weights (exact nearest, zero
coordinate gradient), NaN coords are sanitized (all taps dead). Gradients
flow to the coordinates only (photometric sources are constants, reference
``models/geometry/view_rendering.py:61-82``).

The whole source image lives in VMEM (bf16 [C+1, H, W] ~ 2 MB at DDAD
shapes) as an ordinary pipelined block; bands/windows are aligned dynamic
slices of it. No DMA choreography; works in interpret mode on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_T = 2048     # target pixels per grid step (8 micro-tiles)
_MICRO = 256        # pixels per one-hot matmul (2 lane-tiles)
# Source y-band rows (aligned lattice), per target-pixel layout: 'strip'
# micro-tiles are 0.4-row runs whose bilinear taps span only ~3-6 source
# rows, so a 16-row band halves the matmul M-dim (FLOPs scale with _SH)
# vs 32; 'patch' 16x16 micro-tiles span ~16-20 rows and keep 32-row bands
# (16 would double band-copy/loop overhead for the same total MACs).
# 16 is the bf16 sublane tile — the aligned-lattice minimum.
_SH = {"strip": 16, "patch": 32}
# Source x-window columns (aligned lattice), per layout: a 'strip'
# micro-tile IS a 256-px target run, so its source x-span is ~256 under the
# near-identity temporal warps (256-col windows -> ~2 segments); a 'patch'
# 16x16 micro-tile spans only ~16-40 source columns, and the x one-hot
# compare/convert builds — the kernel's largest VPU item — scale with the
# window width, so 128-col windows halve them at ~1 segment per tile.
_SW = {"strip": 256, "patch": 128}
_C = 3              # image channels (RGB); mask is channel _C


def _tap_range(c: jnp.ndarray, size: int):
    """Tap range of a coord set, clamped near [0, size): (lo, hi_exclusive).

    Taps span [min floor(c), max floor(c)+1]; ``hi`` is EXCLUSIVE of the
    topmost tap (hence +2) so a segment loop over bands always reaches
    the band containing it."""
    c0 = jnp.floor(c)
    lo = jnp.clip(jnp.min(c0), -1.0, float(size)).astype(jnp.int32)
    hi = jnp.clip(jnp.max(c0) + 2.0, -1.0, float(size) + 1.0).astype(jnp.int32)
    return lo, hi


def _fwd_kernel(h: int, w: int, w_pad: int, sh: int, sw_max: int,
                src_ref, x_ref, y_ref,
                out_ref, ddx_ref, ddy_ref, band_ref, aout_ref, adx_ref,
                ady_ref):
    """src (bf16) [C+1, h, w_pad]; x/y [T/_MICRO, _MICRO] f32;
    out [C+1, T] bf16; ddx/ddy [C, T] bf16 (d out_img / d pixel coord);
    band_ref: VMEM scratch [(C+1)*sh, w_pad] bf16 (per-y-band flat copy —
    ONE sublane relayout per band, then x-windows are cheap lane reads);
    aout/adx/ady: f32 VMEM accumulators — cross-band sums stay exact and
    only the final rounded value streams to HBM (bf16 outputs halve both
    the kernel's output writes and the patch-layout permute copies behind
    it; the mask channel is exact 0/1 either way).

    Loop structure: all trip counts are DYNAMIC (exact number of active
    y-bands / x-windows — no skipped-guard iterations), and bands/windows
    live on lattices that never clamp (h % sh == 0, w_pad % sw == 0), so
    each tap belongs to exactly one (band, window) and a single iota
    equality against sentinel-invalidated tap indices builds the one-hots.
    """
    c4 = _C + 1
    n_micro = _BLOCK_T // _MICRO
    sw = min(sw_max, w_pad)
    ci = _C * sh
    big = jnp.int32(-(1 << 24))

    aout_ref[:] = jnp.zeros_like(aout_ref)
    adx_ref[:] = jnp.zeros_like(adx_ref)
    ady_ref[:] = jnp.zeros_like(ady_ref)

    y_lo, y_hi = _tap_range(y_ref[:], h)
    lat_y = jnp.maximum((y_lo // sh) * sh, 0)
    n_yseg = jnp.maximum(
        (jnp.minimum(y_hi, h) - lat_y + sh - 1) // sh, 0)

    iox = jax.lax.broadcasted_iota(jnp.int32, (sw, _MICRO), 0)
    ior = jax.lax.broadcasted_iota(jnp.int32, (sh, _MICRO), 0)

    def yseg_body(ky, _):
        o_k = pl.multiple_of(lat_y + ky * sh, sh)
        band_ref[:] = src_ref[:, pl.ds(o_k, sh), :].reshape(c4 * sh, w_pad)

        def micro_body(m, _):
            x = x_ref[pl.ds(m, 1), :]                   # [1, MICRO]
            yy = y_ref[pl.ds(m, 1), :]

            y0f = jnp.floor(yy)
            ty = yy - y0f
            iy0 = y0f.astype(jnp.int32)
            iy0v = jnp.where(iy0 < h, iy0, big) - o_k
            iy1v = jnp.where(iy0 + 1 < h, iy0 + 1, big) - o_k
            m0 = (ior == iy0v).astype(jnp.float32)
            m1 = (ior == iy1v).astype(jnp.float32)
            wy_val = m0 * (1.0 - ty) + m1 * ty
            py1 = (ty > 0.5).astype(jnp.float32)
            wy_near = m0 * (1.0 - py1) + m1 * py1
            wy_dot = m1 - m0
            wy_val3 = pltpu.repeat(wy_val, _C, axis=0)  # [C*SH, M]
            wy_dot3 = pltpu.repeat(wy_dot, _C, axis=0)

            x0f = jnp.floor(x)
            tx = x - x0f
            ix0 = x0f.astype(jnp.int32)
            ix0v = jnp.where(ix0 < w, ix0, big)
            ix1v = jnp.where(ix0 + 1 < w, ix0 + 1, big)
            px1 = (tx > 0.5).astype(jnp.float32)

            x_lo, x_hi = _tap_range(x, w)
            lat_x = jnp.maximum((x_lo // sw) * sw, 0)
            n_xseg = jnp.maximum(
                (jnp.minimum(x_hi, w) - lat_x + sw - 1) // sw, 0)

            @pl.when(jnp.any(wy_val > 0) | jnp.any(wy_near > 0))
            def _():
                def xseg_body(jx, _):
                    x0a = pl.multiple_of(lat_x + jx * sw, 128)
                    sub = band_ref[:, pl.ds(x0a, sw)]   # [C4*SH, sw]
                    oh0 = (iox == ix0v - x0a).astype(jnp.bfloat16)
                    oh1 = (iox == ix1v - x0a).astype(jnp.bfloat16)
                    t0 = jax.lax.dot_general(
                        sub, oh0, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    t1 = jax.lax.dot_general(
                        sub, oh1, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    # flat-2D combines (rows = c*sh + y, c-major)
                    mix_i = (1.0 - tx) * t0[:ci] + tx * t1[:ci]
                    mix_m = (1.0 - px1) * t0[ci:] + px1 * t1[ci:]
                    img = jnp.sum(
                        (mix_i * wy_val3).reshape(_C, sh, _MICRO), axis=1)
                    msk = jnp.sum(mix_m * wy_near, axis=0, keepdims=True)
                    ddx = jnp.sum(
                        ((t1 - t0)[:ci] * wy_val3).reshape(_C, sh, _MICRO),
                        axis=1)
                    ddy = jnp.sum(
                        (mix_i * wy_dot3).reshape(_C, sh, _MICRO), axis=1)

                    sl = pl.ds(pl.multiple_of(m * _MICRO, _MICRO), _MICRO)
                    aout_ref[:, sl] += jnp.concatenate([img, msk], 0)
                    adx_ref[:, sl] += ddx
                    ady_ref[:, sl] += ddy
                    return 0

                jax.lax.fori_loop(0, n_xseg, xseg_body, 0, unroll=False)
            return 0

        jax.lax.fori_loop(0, n_micro, micro_body, 0)
        return 0

    jax.lax.fori_loop(0, n_yseg, yseg_body, 0, unroll=False)

    out_ref[:] = aout_ref[:].astype(out_ref.dtype)
    ddx_ref[:] = adx_ref[:].astype(ddx_ref.dtype)
    ddy_ref[:] = ady_ref[:].astype(ddy_ref.dtype)


_PATCH = (16, 16)   # patch layout: each micro-tile is a 16x16 image patch


def _patchable(h, w, n):
    ph, pw = _PATCH
    return n == h * w and h % ph == 0 and w % pw == 0


def _to_patches(a, h, w):
    """[B, H*W] row-major -> patch-major (each 256 = one 16x16 patch)."""
    ph, pw = _PATCH
    b = a.shape[0]
    a = a.reshape(b, h // ph, ph, w // pw, pw)
    return jnp.transpose(a, (0, 1, 3, 2, 4)).reshape(b, h * w)


def _from_patches(a, h, w):
    """[B, C, H*W] patch-major -> row-major (inverse of _to_patches)."""
    ph, pw = _PATCH
    b, c = a.shape[:2]
    a = a.reshape(b, c, h // ph, w // pw, ph, pw)
    return jnp.transpose(a, (0, 1, 2, 4, 3, 5)).reshape(b, c, h * w)


def _prep(img, mask, coords, layout="strip", coords_hw=None):
    """-> (src [B, C+1, H, Wp] bf16, x, y [B, Np/_MICRO, _MICRO] f32, n, np).

    coords_hw: the target-pixel grid shape behind ``coords`` (defaults to
    the source image shape) — windowed warps pass the window box shape so
    the patch layout applies to the box, not the source."""
    b, h, w, c = img.shape
    sh = _SH[layout]
    assert c == _C, f"warp_mxu expects {_C} image channels, got {c}"
    assert h >= sh and h % sh == 0, (
        f"warp_mxu needs H a multiple of {sh}, got {h}")
    src = jnp.concatenate([img, mask.astype(img.dtype)], axis=-1)
    src = jnp.transpose(src, (0, 3, 1, 2)).astype(jnp.bfloat16)
    # pad W to a multiple of the x-window so the window lattice never
    # clamps (each tap belongs to exactly one window)
    w_pad = -(-w // 128) * 128
    sw = min(_SW[layout], w_pad)
    w_pad = -(-w_pad // sw) * sw
    if w_pad != w:
        src = jnp.pad(src, ((0, 0), (0, 0), (0, 0), (0, w_pad - w)))

    n = coords.shape[1]
    finite = jnp.all(jnp.isfinite(coords), axis=-1)
    # EXACTLY the gather path's pixel transform (ops/warp_quad._tap_data):
    # (c + 1) * (0.5 * (size-1)) — a different association changes f32
    # rounding and flips nearest-mask picks at ties
    x = (jnp.where(finite, coords[..., 0], -4.0) + 1.0) * (0.5 * (w - 1))
    y = (jnp.where(finite, coords[..., 1], -4.0) + 1.0) * (0.5 * (h - 1))
    # Huge-but-finite NDC coords (near-zero projection depth) overflow the
    # transform above to +-inf, and inf - floor(inf) = NaN inside the
    # kernel's tap weights (the quad gather path clamps instead). Any
    # |pixel| beyond the image is an all-dead tap with zero coordinate
    # gradient either way, so a finite clamp is semantics-preserving.
    x = jnp.clip(x, -1e6, 1e6)
    y = jnp.clip(y, -1e6, 1e6)
    th, tw = coords_hw or (h, w)
    if layout == "patch" and _patchable(th, tw, n):
        # each micro-tile becomes a 16x16 target patch: cross-camera warps
        # have x/y spreads proportional to the patch extent, so square
        # patches hit far fewer (y-band x x-window) cells than 0.4-row
        # linear strips (the kernel itself is pixel-order oblivious)
        x = _to_patches(x, th, tw)
        y = _to_patches(y, th, tw)
    n_pad = -(-n // _BLOCK_T) * _BLOCK_T
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n))
        x = jnp.pad(x, pad, constant_values=-4.0)
        y = jnp.pad(y, pad, constant_values=-4.0)
    x = x.reshape(b, n_pad // _MICRO, _MICRO).astype(jnp.float32)
    y = y.reshape(b, n_pad // _MICRO, _MICRO).astype(jnp.float32)
    return src, x, y, n, n_pad


def _fwd_call(src, x, y, h, w, w_pad, n_pad, sh, sw_max, out_dtype):
    b = src.shape[0]
    rows = _BLOCK_T // _MICRO
    grid = (b, n_pad // _BLOCK_T)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h, w, w_pad, sh, sw_max),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, _C + 1, h, w_pad), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rows, _MICRO), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rows, _MICRO), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, _C + 1, _BLOCK_T), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _C, _BLOCK_T), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _C, _BLOCK_T), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, _C + 1, n_pad), out_dtype),
            # the d/dx, d/dy maps only ever multiply the upstream gradient
            # (bwd below): bf16 streaming halves their HBM writes and the
            # patch-layout permute copies behind them, at a zero-mean ~0.4%
            # relative rounding of COORDINATE gradients only (the warped
            # values stay exact in out_dtype; cosine-bounded in
            # tests/test_warp_mxu.py)
            jax.ShapeDtypeStruct((b, _C, n_pad), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, _C, n_pad), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM(((_C + 1) * sh, w_pad), jnp.bfloat16),
            pltpu.VMEM((_C + 1, _BLOCK_T), jnp.float32),
            pltpu.VMEM((_C, _BLOCK_T), jnp.float32),
            pltpu.VMEM((_C, _BLOCK_T), jnp.float32)],
        interpret=(jax.default_backend() != "tpu"),
    )(src, x, y)


def _run(img, mask, coords, layout, coords_hw=None):
    h, w = img.shape[1], img.shape[2]
    src, x, y, n, n_pad = _prep(img, mask, coords, layout, coords_hw)
    # Outputs stream to HBM in the image's own dtype: bf16 in production
    # (halves the kernel's writes and the patch-permute copies behind it),
    # f32 when mixed precision is off — an f32 config must not round warped
    # values to bf16 (bf16-ulp flips amplify cross-compilation f32 noise
    # through the discrete automask, breaking SPMD numeric-equivalence).
    out, ddx, ddy = _fwd_call(src, x, y, h, w, src.shape[-1], n_pad,
                              _SH[layout], _SW[layout], img.dtype)
    th, tw = coords_hw or (h, w)
    if layout == "patch" and _patchable(th, tw, coords.shape[1]):
        # back to canonical row-major order (residuals included, so the
        # backward dot needs no permutation)
        out = _from_patches(out[:, :, :n], th, tw)
        ddx = _from_patches(ddx[:, :, :n], th, tw)
        ddy = _from_patches(ddy[:, :, :n], th, tw)
    else:
        out, ddx, ddy = out[:, :, :n], ddx[:, :, :n], ddy[:, :, :n]
    out = jnp.transpose(out, (0, 2, 1))
    return (out[..., :_C].astype(img.dtype), out[..., _C:].astype(img.dtype),
            ddx, ddy)


def _make_op(layout, coords_hw=None):
    @jax.custom_vjp
    def op(img, mask, coords):
        img_w, mask_w, _, _ = _run(img, mask, coords, layout, coords_hw)
        return img_w, mask_w

    def fwd(img, mask, coords):
        img_w, mask_w, ddx, ddy = _run(img, mask, coords, layout, coords_hw)
        finite = jnp.all(jnp.isfinite(coords), axis=-1, keepdims=True)
        # img/mask ride along only for zeros_like (inputs stay live during
        # grad anyway — no extra memory)
        return (img_w, mask_w), (ddx, ddy, finite, img, mask)

    def bwd(res, gs):
        ddx, ddy, finite, img, mask = res
        h, w = img.shape[1], img.shape[2]
        g_img, _g_mask = gs                  # nearest mask: no coord grad
        g = jnp.transpose(g_img, (0, 2, 1)).astype(jnp.float32)  # [B, C, N]
        gx = jnp.sum(g * ddx, axis=1) * (0.5 * (w - 1))
        gy = jnp.sum(g * ddy, axis=1) * (0.5 * (h - 1))
        dcoords = jnp.where(finite, jnp.stack([gx, gy], axis=-1), 0.0)
        return jnp.zeros_like(img), jnp.zeros_like(mask), dcoords

    op.defvjp(fwd, bwd)
    return op


_OPS = {"strip": _make_op("strip"), "patch": _make_op("patch")}
_WIN_OPS: dict = {}   # (layout, th, tw) -> op (windowed-coords variants)


def warp_image_mask_mxu(img: jnp.ndarray, mask: jnp.ndarray,
                        coords: jnp.ndarray, layout: str = "strip",
                        coords_hw=None):
    """Jointly warp image (bilinear) + mask (nearest) on the MXU.

    Drop-in for ``ops/warp_quad.warp_image_mask_quad``:
    img [B, H, W, 3]; mask [B, H, W, 1]; coords [B, N, 2] normalized (x, y)
    in [-1, 1] (align_corners). Returns (img_w [B, N, 3], mask_w [B, N, 1]);
    gradients flow to coords only.

    layout: 'strip' = micro-tiles are 0.4-row runs (best for near-identity
    temporal warps); 'patch' = 16x16 target patches (best for cross-camera
    overlap warps with large coordinate spreads). Identical results.

    coords_hw: target-pixel grid shape behind ``coords`` when it is NOT the
    source image grid (windowed warps pass the window box shape; the patch
    layout then applies to the box).
    """
    if coords_hw is None:
        return _OPS[layout](img, mask, coords)
    key = (layout, int(coords_hw[0]), int(coords_hw[1]))
    if key not in _WIN_OPS:
        _WIN_OPS[key] = _make_op(layout, (key[1], key[2]))
    return _WIN_OPS[key](img, mask, coords)
