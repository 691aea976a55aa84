"""MXU warp kernel == gather warp (ops/warp_quad) — values and gradients.

The kernel quantizes vs the f32 gather path in two places: bf16 rounding
of the source values, and bf16 rounding of the outputs / d-dx,d-dy residual
maps (one ulp ~ 0.4% relative, zero-mean). On bf16-representable inputs the
two paths must agree to those bounds. Runs the Pallas interpreter on CPU.
"""
import numpy as np
import jax
import jax.numpy as jnp

from vfdepth_tpu.ops.warp_quad import warp_image_mask_quad
from vfdepth_tpu.ops.warp_mxu import warp_image_mask_mxu

H, W = 64, 96  # W deliberately not a multiple of 128 (pad path)


def _setup(seed, b=2, n=None, coord_span=1.4):
    """bf16-representable image + mask + coords (in [-span, span], so both
    fully-inside and out-of-bounds taps occur)."""
    rng = np.random.RandomState(seed)
    n = H * W if n is None else n
    img = rng.rand(b, H, W, 3).astype(np.float32)
    img = np.asarray(jnp.asarray(img).astype(jnp.bfloat16).astype(jnp.float32))
    mask = (rng.rand(b, H, W, 1) > 0.3).astype(np.float32)
    coords = rng.uniform(-coord_span, coord_span, (b, n, 2)).astype(np.float32)
    # exercise NaN handling and exact-border coords
    coords[:, :7, 0] = np.nan
    coords[:, 7:9, :] = 1.0
    coords[:, 9:11, :] = -1.0
    return jnp.asarray(img), jnp.asarray(mask), jnp.asarray(coords)


def test_mxu_matches_quad_values():
    img, mask, coords = _setup(0)
    iq, mq = warp_image_mask_quad(img, mask, coords)
    im, mm = warp_image_mask_mxu(img, mask, coords)
    np.testing.assert_allclose(np.asarray(im), np.asarray(iq),
                               atol=4e-3, rtol=4e-3)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(mq), atol=1e-6)


def test_mxu_matches_quad_values_nonmultiple_n():
    """N not a multiple of the strip size exercises the pad/slice path."""
    img, mask, coords = _setup(3, b=1, n=1000)
    iq, mq = warp_image_mask_quad(img, mask, coords)
    im, mm = warp_image_mask_mxu(img, mask, coords)
    np.testing.assert_allclose(np.asarray(im), np.asarray(iq),
                               atol=4e-3, rtol=4e-3)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(mq), atol=1e-6)


def test_mxu_coordinate_gradients_match_quad():
    img, mask, coords = _setup(1, b=1)

    def loss_quad(c):
        iw, mw = warp_image_mask_quad(img, mask, c)
        return jnp.sum(iw ** 2) + jnp.sum(mw * 0.25)

    def loss_mxu(c):
        iw, mw = warp_image_mask_mxu(img, mask, c)
        return jnp.sum(iw ** 2) + jnp.sum(mw * 0.25)

    gq = np.asarray(jax.grad(loss_quad)(coords))
    gm = np.asarray(jax.grad(loss_mxu)(coords))
    # ddx/ddy residuals are bf16 (zero-mean ~0.4% relative rounding before
    # the 0.5*(dim-1) pixel scaling): bound per-entry error by a fraction
    # of the gradient's overall scale and require near-parallel aggregates
    scale = np.abs(gq).max()
    np.testing.assert_allclose(gm, gq, atol=2e-2 * scale, rtol=2e-2)
    cos = (gq.ravel() @ gm.ravel()) / (
        np.linalg.norm(gq) * np.linalg.norm(gm) + 1e-12)
    assert cos > 0.9995, cos


def test_mxu_wide_y_span():
    """Coords spanning the whole image vertically within one strip force
    many band segments; results must still be exact."""
    rng = np.random.RandomState(7)
    img, mask, _ = _setup(2, b=1)
    n = 2048
    coords = np.stack([rng.uniform(-1, 1, (1, n)),
                       np.linspace(-1.05, 1.05, n)[None, :]], axis=-1)
    coords = jnp.asarray(coords.astype(np.float32))
    iq, mq = warp_image_mask_quad(img, mask, coords)
    im, mm = warp_image_mask_mxu(img, mask, coords)
    np.testing.assert_allclose(np.asarray(im), np.asarray(iq),
                               atol=4e-3, rtol=4e-3)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(mq), atol=1e-6)


def test_render_views_mxu_equals_quad():
    """Full render_views with warp_op='mxu' == 'quad' on a 3-cam rig
    (temporal + spatio + spatio-temporal warps through the kernel)."""
    import pytest
    from tests.test_warp_window import _setup as _scene_setup, _render

    s = _scene_setup(seed=3)

    dense = _render(s, None)
    import vfdepth_tpu.geometry.view_rendering as vr
    mxu = vr.render_views(
        s["colors"], s["mask"], s["k"], s["inv_k"], s["depth"],
        s["cam_t_cam"], s["spatio_pose"], s["st_pose"],
        jnp.asarray(s["rel"]), (0, -1, 1), do_intensity_align=True,
        spatio=True, spatio_temporal=True,
        min_depth=1.5, max_depth=200.0, windows=None, warp_op="mxu")
    np.testing.assert_allclose(np.asarray(mxu.temporal_img),
                               np.asarray(dense.temporal_img),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mxu.temporal_mask),
                               np.asarray(dense.temporal_mask), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mxu.overlap_img),
                               np.asarray(dense.overlap_img),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mxu.overlap_mask),
                               np.asarray(dense.overlap_mask), atol=1e-6)


def test_ceil_tap_on_band_boundary():
    """Regression: a strip whose topmost (ceil) tap lands exactly on a
    y-band start (y_lo=-1 via a NaN pixel, max y tap = 31 = -1+32) must not
    drop that tap's contribution."""
    rng = np.random.RandomState(11)
    img, mask, _ = _setup(4, b=1)
    n = 2048
    c = np.zeros((1, n, 2), np.float32)
    c[..., 0] = rng.uniform(-0.9, 0.9, (1, n))
    # pixel y = 30.9 -> floor 30, ceil tap 31 with weight 0.9
    c[..., 1] = (30.9 / (H - 1)) * 2 - 1
    c[0, 0, :] = np.nan  # pins y_lo to -1
    coords = jnp.asarray(c)
    iq, mq = warp_image_mask_quad(img, mask, coords)
    im, mm = warp_image_mask_mxu(img, mask, coords)
    np.testing.assert_allclose(np.asarray(im), np.asarray(iq),
                               atol=4e-3, rtol=4e-3)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(mq), atol=1e-6)


def test_patch_layout_equals_strip():
    """layout='patch' permutes target pixels into 16x16 patches around the
    (order-oblivious) kernel; results must match the strip layout to f32
    accumulation-order tolerance (the layouts use different y-band heights
    — 16 vs 32 rows — so per-pixel sums associate differently; the mask is
    exact 0/1 either way)."""
    img, mask, coords = _setup(5, b=1)  # n = H*W, patchable

    is_, ms_ = warp_image_mask_mxu(img, mask, coords, layout="strip")
    ip, mp = warp_image_mask_mxu(img, mask, coords, layout="patch")
    # outputs are bf16 (one ulp ~ 0.008 at |x|~1): accumulation-order
    # differences between the 16- and 32-row band heights can round to
    # adjacent bf16 values
    np.testing.assert_allclose(np.asarray(ip), np.asarray(is_), atol=1e-2)
    np.testing.assert_array_equal(np.asarray(mp), np.asarray(ms_))

    def loss(c, layout):
        iw, mw = warp_image_mask_mxu(img, mask, c, layout=layout)
        return jnp.sum(iw ** 2) + jnp.sum(mw * 0.25)

    gs = jax.grad(lambda c: loss(c, "strip"))(coords)
    gp = jax.grad(lambda c: loss(c, "patch"))(coords)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                               atol=1e-2, rtol=1e-2)


def test_huge_finite_coords_no_nan():
    """NDC coords that are finite but overflow the pixel transform to inf
    (near-zero projection depths produce |ndc| up to ~3e38) must behave
    like any other far-out-of-image point: zero output, zero mask, zero
    coordinate gradient — never NaN (inf - floor(inf) = NaN poisoned the
    tap weights before the _prep clamp)."""
    img, mask, coords = _setup(11, b=1)
    c = np.array(coords)
    c[:, 20:40] = 3.0e38
    c[:, 40:60, 0] = -3.2e38
    c[:, 40:60, 1] = 0.0
    c[:, 60:80] = 1e30
    coords = jnp.asarray(c)

    for layout in ("strip", "patch"):
        im, mm = warp_image_mask_mxu(img, mask, coords, layout=layout)
        iq, mq = warp_image_mask_quad(img, mask, coords)
        assert not bool(jnp.any(jnp.isnan(im)))
        np.testing.assert_allclose(np.asarray(im), np.asarray(iq), atol=1e-2)
        np.testing.assert_array_equal(np.asarray(mm), np.asarray(mq))

        g = jax.grad(lambda cc: jnp.sum(
            warp_image_mask_mxu(img, mask, cc, layout=layout)[0]
            .astype(jnp.float32) ** 2))(coords)
        assert not bool(jnp.any(jnp.isnan(g)))
        np.testing.assert_array_equal(np.asarray(g[:, 20:80]), 0.0)
