"""Pallas sampling-kernel parity tests (CPU interpret mode).

The kernel itself targets TPU; ``interpret=True`` (automatic off-TPU) runs
the same program through the Pallas interpreter, validating the one-hot
construction and both matmul directions against the gather reference.
"""
import numpy as np
import jax
import jax.numpy as jnp

from vfdepth_tpu.ops.grid_sample import grid_sample_2d
from vfdepth_tpu.ops.pallas_sample import sample_bilinear_pallas


def test_pallas_forward_matches_gather():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 8, 10, 7).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.3, 1.3, (2, 600, 2)).astype(np.float32))
    got = np.asarray(sample_bilinear_pallas(img, coords))
    want = np.asarray(grid_sample_2d(img, coords))
    # kernel matmuls run in bf16 -> ~1e-2 relative tolerance
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.02)


def test_pallas_nonfinite_coords_zero():
    img = jnp.ones((1, 8, 10, 3))
    coords = jnp.asarray([[[0.0, 0.0], [np.nan, 0.2], [2.5, 0.0]]], jnp.float32)
    out = np.asarray(sample_bilinear_pallas(img, coords))
    np.testing.assert_allclose(out[0, 0], 1.0, atol=0.02)
    np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-6)  # nan -> no taps
    np.testing.assert_allclose(out[0, 2], 0.0, atol=1e-6)  # oob -> no taps


def test_pallas_backward_matches_gather_vjp():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(1, 8, 10, 5).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.1, 1.1, (1, 300, 2)).astype(np.float32))

    def loss_pal(i):
        return jnp.sum(sample_bilinear_pallas(i, coords) ** 2)

    def loss_ref(i):
        return jnp.sum(grid_sample_2d(i, coords) ** 2)

    g_pal = np.asarray(jax.grad(loss_pal)(img))
    g_ref = np.asarray(jax.grad(loss_ref)(img))
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_pal, g_ref, atol=0.05 * scale, rtol=0.05)


def test_pallas_no_coord_gradient():
    """Coordinates are declared non-differentiable (zero gradient)."""
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 50, 2)).astype(np.float32))
    g = jax.grad(lambda c: jnp.sum(sample_bilinear_pallas(img, c)))(coords)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_pallas_masked_sampler_matches_separate_ops():
    """Fused feature+mask kernel == bilinear feature sample + separate
    NEAREST mask gather; the mask channel carries no gradient."""
    from vfdepth_tpu.ops.pallas_sample import (
        sample_bilinear_with_nearest_mask_pallas)

    rng = np.random.RandomState(3)
    b, h, w, c, n = 2, 48, 80, 16, 4096
    img = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, h, w, 1) > 0.4).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.3, 1.3, (b, n, 2)).astype(np.float32))

    fm = sample_bilinear_with_nearest_mask_pallas(img, mask, coords)
    assert fm.shape == (b, n, c + 1)
    feat_ref = sample_bilinear_pallas(img, coords)
    m_ref = grid_sample_2d(mask, coords, mode="nearest")[..., 0]
    np.testing.assert_allclose(np.asarray(fm[..., :-1]),
                               np.asarray(feat_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fm[..., -1]), np.asarray(m_ref),
                               atol=1e-6)

    # gradients: feature grads equal the unfused kernel's; mask grad zero
    def loss_fused(i, mk):
        return jnp.sum(sample_bilinear_with_nearest_mask_pallas(
            i, mk, coords)[..., :-1] ** 2)

    def loss_plain(i):
        return jnp.sum(sample_bilinear_pallas(i, coords) ** 2)

    gi, gm = jax.grad(loss_fused, argnums=(0, 1))(img, mask)
    gi_ref = jax.grad(loss_plain)(img)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gi_ref), atol=1e-5)
    assert float(jnp.max(jnp.abs(gm))) == 0.0


def test_backproject_fused_epilogue():
    """sample_backproject_pallas = ([feat * valid, rel * valid], valid) with
    valid = nearest mask > 0.5 — the kernel-side fold of the
    back-projection's per-point epilogue. Values and gradients must equal
    the unfused composition."""
    from vfdepth_tpu.ops.pallas_sample import sample_backproject_pallas

    rng = np.random.RandomState(7)
    b, h, w, c, n = 2, 32, 80, 8, 2000
    img = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, h, w, 1) > 0.3).astype(np.float32))
    coords = rng.uniform(-1.2, 1.2, (b, n, 2)).astype(np.float32)
    coords[:, -300:] = -3.0       # sanitized (invalid) points
    coords = jnp.asarray(coords)
    rel = jnp.asarray(rng.randn(b, n).astype(np.float32))

    out, valid_out = sample_backproject_pallas(img, mask, coords, rel)
    assert out.shape == (b, n, c + 1) and valid_out.shape == (b, n)
    feat_ref = sample_bilinear_pallas(img, coords)
    m_ref = grid_sample_2d(mask, coords, mode="nearest")[..., 0]
    valid_ref = (np.asarray(m_ref) > 0.5).astype(np.float32)
    np.testing.assert_allclose(np.asarray(valid_out), valid_ref, atol=0)
    np.testing.assert_allclose(
        np.asarray(out[..., :c]),
        np.asarray(feat_ref) * valid_ref[..., None], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out[..., c]),
        np.asarray(rel).astype(np.float32) * valid_ref, atol=1e-2)

    # image gradient: masked rows contribute nothing
    def loss_fused(i):
        return jnp.sum(sample_backproject_pallas(
            i, mask, coords, rel)[0][..., :c].astype(jnp.float32) ** 2)

    def loss_ref(i):
        s = sample_bilinear_pallas(i, coords)
        return jnp.sum((s * jnp.asarray(valid_ref)[..., None]) ** 2)

    gi = jax.grad(loss_fused)(img)
    gi_ref = jax.grad(loss_ref)(img)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gi_ref), atol=1e-4)


def test_pallas_backward_grid_channel_chunks():
    """C > 256 exercises the grid channel-chunk axis of the backward kernel
    (each chunk accumulates independently; results must equal a narrow-C
    reference run column-for-column)."""
    rng = np.random.RandomState(5)
    h, w, c, n = 16, 16, 320, 200
    img = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.1, 1.1, (1, n, 2)).astype(np.float32))
    gct = jnp.asarray(rng.randn(1, n, c).astype(np.float32))

    _, vjp = jax.vjp(lambda i: sample_bilinear_pallas(i, coords), img)
    (dimg,) = vjp(gct)
    # per-column reference: run the same VJP on 128-channel slices
    for o in range(0, c, 128):
        _, vjp_s = jax.vjp(
            lambda i: sample_bilinear_pallas(i, coords), img[..., o:o + 128])
        (dref,) = vjp_s(gct[..., o:o + 128])
        np.testing.assert_allclose(np.asarray(dimg[..., o:o + 128]),
                                   np.asarray(dref), atol=1e-4)


def test_backproject_raw_matches_ndc_pipeline():
    """Raw-coords mode (in-kernel perspective divide + sanitize + rel
    epilogue) == the XLA coordinate pipeline feeding the ndc-mode kernel.
    Covers behind-camera points (z < 0), near-zero depths (divide
    overflow), and out-of-bounds projections."""
    from vfdepth_tpu.ops.pallas_sample import (
        sample_backproject_pallas, sample_backproject_raw_pallas)

    rng = np.random.RandomState(17)
    b, h, w, c, n = 2, 32, 80, 8, 1500
    img = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, h, w, 1) > 0.3).astype(np.float32))
    # camera-plane points: u, v ~ pixel * z with a mix of depths
    z = rng.uniform(-2.0, 10.0, (b, n)).astype(np.float32)
    z[:, :20] = rng.uniform(-1e-7, 1e-7, (b, 20))     # near-zero depths
    px = rng.uniform(-20, w + 20, (b, n)).astype(np.float32)
    py = rng.uniform(-20, h + 20, (b, n)).astype(np.float32)
    cam = np.stack([px * z, py * z, z], axis=-1)
    cam3 = jnp.asarray(cam)
    rel_scale = 1.0 / 24.0

    # reference: the XLA pipeline from vfnet._project_voxel_coords
    zp = cam[..., 2] + 1e-8
    xy = cam[..., :2] / zp[..., None]
    xy = np.nan_to_num(xy, nan=2.0 * w, posinf=2.0 * w, neginf=-2.0 * w)
    xy = np.clip(xy, -2.0 * w, 2.0 * w)
    ndc = xy / np.array([0.5 * (w - 1), 0.5 * (h - 1)]) - 1.0
    ok = ((cam[..., 2] > 0) & (ndc[..., 0] >= -1) & (ndc[..., 0] <= 1)
          & (ndc[..., 1] >= -1) & (ndc[..., 1] <= 1))
    ndc = np.where(ok[..., None], ndc, -3.0).astype(np.float32)
    rel = (cam[..., 2] * rel_scale).astype(np.float32)

    f_ref, v_ref = sample_backproject_pallas(
        img, mask, jnp.asarray(ndc), jnp.asarray(rel))
    f_raw, v_raw = sample_backproject_raw_pallas(img, mask, cam3, rel_scale)
    np.testing.assert_array_equal(np.asarray(v_raw), np.asarray(v_ref))
    np.testing.assert_allclose(np.asarray(f_raw), np.asarray(f_ref),
                               atol=2e-2, rtol=2e-2)

    # gradients agree (both gate by the same validity)
    gi_ref = jax.grad(lambda i: jnp.sum(sample_backproject_pallas(
        i, mask, jnp.asarray(ndc), jnp.asarray(rel))[0] ** 2))(img)
    gi_raw = jax.grad(lambda i: jnp.sum(sample_backproject_raw_pallas(
        i, mask, cam3, rel_scale)[0] ** 2))(img)
    scale = np.abs(np.asarray(gi_ref)).max() + 1e-12
    np.testing.assert_allclose(np.asarray(gi_raw), np.asarray(gi_ref),
                               atol=0.03 * scale, rtol=0.03)


def test_bwd_kernel_ignores_nan_tail_rows():
    """Regression: the backward kernel's grid need not divide N, and the
    partial last block's out-of-bounds rows of g AND valid are undefined
    memory that can hold NaN bit patterns. One NaN row poisons the whole
    per-camera accumulator through the matmul contraction (the root cause
    of a whole-training NaN that flipped with unrelated config changes —
    the garbage contents depend on buffer reuse). Simulate the undefined
    tail deterministically: pad g/coords/valid with NaN up to the block
    size and pass the true point count as n_valid — the kernel must
    reproduce the unpadded result exactly, for both the plain and the
    group-reduced layouts."""
    from vfdepth_tpu.ops.pallas_sample import _bwd_call, _BLOCK_N

    rng = np.random.RandomState(13)
    b, h, w, c, n = 2, 16, 80, 8, 700
    coords = rng.uniform(-1.2, 1.2, (b, n, 2)).astype(np.float32)
    g = rng.randn(b, n, c).astype(np.float32)
    valid = (rng.rand(b, n) > 0.3).astype(np.float32)

    ref = np.asarray(_bwd_call(jnp.asarray(g), jnp.asarray(coords), h, w,
                               valid=jnp.asarray(valid)))

    pad = _BLOCK_N - n
    nanpad = lambda a: np.pad(a, [(0, 0), (0, pad)] + [(0, 0)] * (a.ndim - 2),
                              constant_values=np.nan)
    got = np.asarray(_bwd_call(
        jnp.asarray(nanpad(g)), jnp.asarray(nanpad(coords)), h, w,
        valid=jnp.asarray(nanpad(valid)), n_valid=n))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, atol=1e-6)

    # grouped layout: g is [b, 2, N, C] group sums, cameras read their
    # group's block gated by per-camera validity
    gs = 2
    cams = 2 * gs
    cg = rng.uniform(-1.2, 1.2, (b * cams, n, 2)).astype(np.float32)
    gg = rng.randn(b, 2, n, c).astype(np.float32)
    vg = (rng.rand(b * cams, n) > 0.3).astype(np.float32)
    ref_g = np.asarray(_bwd_call(jnp.asarray(gg), jnp.asarray(cg), h, w,
                                 valid=jnp.asarray(vg), group_size=gs))
    nanpad2 = lambda a, ax: np.pad(
        a, [(0, 0)] * ax + [(0, pad)] + [(0, 0)] * (a.ndim - ax - 1),
        constant_values=np.nan)
    got_g = np.asarray(_bwd_call(
        jnp.asarray(nanpad2(gg, 2)), jnp.asarray(nanpad2(cg, 1)), h, w,
        valid=jnp.asarray(nanpad2(vg, 1)), group_size=gs, n_valid=n))
    assert np.isfinite(got_g).all()
    np.testing.assert_allclose(got_g, ref_g, atol=1e-6)


def test_backproject_grouped_matches_per_camera_sums():
    """The group-reduced kernel (camera axis summed in-kernel into the two
    static overlap groups, backward gated by the forward-emitted
    per-camera validity) must
    match per-camera sample_backproject_pallas summed by groups — values,
    count, and image gradients."""
    from vfdepth_tpu.ops.pallas_sample import (
        sample_backproject_grouped_pallas, sample_backproject_pallas)

    rng = np.random.RandomState(11)
    b, gs, h, w, c, n = 2, 2, 32, 80, 8, 2000
    cams = 2 * gs
    img = jnp.asarray(rng.randn(b * cams, h, w, c).astype(np.float32))
    mask = jnp.asarray((rng.rand(b * cams, h, w, 1) > 0.3).astype(np.float32))
    coords = rng.uniform(-1.2, 1.2, (b * cams, n, 2)).astype(np.float32)
    coords[:, -300:] = -3.0       # sanitized (invalid) points
    coords = jnp.asarray(coords)
    rel = jnp.asarray(rng.randn(b * cams, n).astype(np.float32))

    feat_g, cnt_g = sample_backproject_grouped_pallas(
        img, mask, coords, rel, b, gs)
    assert feat_g.shape == (b, 2, n, c + 1) and cnt_g.shape == (b, 2, n)

    out, valid = sample_backproject_pallas(img, mask, coords, rel)
    out = np.asarray(out).reshape(b, 2, gs, n, c + 1)
    valid = np.asarray(valid).reshape(b, 2, gs, n)
    np.testing.assert_allclose(np.asarray(feat_g), out.sum(2),
                               atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(cnt_g), valid.sum(2), atol=0)

    # image gradient: each camera reads its group's cotangent, gated by its
    # own (forward-emitted) validity
    tgt = jnp.asarray(rng.randn(b, 2, n, c + 1).astype(np.float32))

    def loss_grouped(i):
        f, _ = sample_backproject_grouped_pallas(i, mask, coords, rel, b, gs)
        return jnp.sum((f.astype(jnp.float32) * tgt) ** 2)

    def loss_ref(i):
        f, _ = sample_backproject_pallas(i, mask, coords, rel)
        fg = jnp.sum(f.reshape(b, 2, gs, n, c + 1), axis=2)
        return jnp.sum((fg.astype(jnp.float32) * tgt) ** 2)

    gi = np.asarray(jax.grad(loss_grouped)(img))
    gi_ref = np.asarray(jax.grad(loss_ref)(img))
    scale = np.abs(gi_ref).max()
    np.testing.assert_allclose(gi, gi_ref, atol=0.05 * scale, rtol=0.05)
