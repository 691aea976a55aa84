"""Sampler parity tests against torch.nn.functional.grid_sample (CPU golden)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vfdepth_tpu.ops import grid_sample_2d, grid_sample_3d, resize_bilinear, resize_nearest, upsample2x_nearest


def _rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_bilinear_2d_matches_torch():
    b, h, w, c = 2, 7, 9, 3
    img = _rand((b, h, w, c), 0)
    coords = np.random.RandomState(1).uniform(-1.4, 1.4, size=(b, 5, 6, 2)).astype(np.float32)

    got = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords)))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    tgrid = torch.from_numpy(coords)
    want = F.grid_sample(timg, tgrid, mode="bilinear", padding_mode="zeros",
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nearest_2d_matches_torch():
    b, h, w, c = 2, 6, 8, 1
    img = _rand((b, h, w, c), 2)
    coords = np.random.RandomState(3).uniform(-1.3, 1.3, size=(b, 4, 4, 2)).astype(np.float32)

    got = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords), mode="nearest"))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    tgrid = torch.from_numpy(coords)
    want = F.grid_sample(timg, tgrid, mode="nearest", padding_mode="zeros",
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_trilinear_3d_matches_torch():
    b, d, h, w, c = 2, 5, 6, 7, 4
    vol = _rand((b, d, h, w, c), 4)
    coords = np.random.RandomState(5).uniform(-1.4, 1.4, size=(b, 3, 4, 5, 3)).astype(np.float32)

    got = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords)))

    tvol = torch.from_numpy(vol).permute(0, 4, 1, 2, 3)  # [b, c, d, h, w]
    tgrid = torch.from_numpy(coords)
    want = F.grid_sample(tvol, tgrid, mode="bilinear", padding_mode="zeros",
                         align_corners=True).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nonfinite_coords_give_zero_and_mask():
    img = jnp.ones((1, 4, 4, 2))
    coords = jnp.array([[[0.0, 0.0], [jnp.nan, 0.0], [jnp.inf, 0.5]]])
    out, finite = grid_sample_2d(img, coords, with_finite_mask=True)
    out = np.asarray(out)
    np.testing.assert_allclose(out[0, 0], [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(finite)[0, :, 0], [1.0, 0.0, 0.0])


def test_extra_leading_dims():
    """Camera axis as an extra batch dim must broadcast through."""
    img = _rand((2, 3, 5, 5, 2), 6)  # [b, cams, H, W, C]
    coords = np.random.RandomState(7).uniform(-1, 1, size=(2, 3, 11, 2)).astype(np.float32)
    got = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords)))
    assert got.shape == (2, 3, 11, 2)
    # check one slice against torch
    timg = torch.from_numpy(img[1, 2][None]).permute(0, 3, 1, 2)
    tgrid = torch.from_numpy(coords[1, 2][None, None])
    want = F.grid_sample(timg, tgrid, align_corners=True).permute(0, 2, 3, 1).numpy()[0, 0]
    np.testing.assert_allclose(got[1, 2], want, atol=1e-5)


def test_resize_bilinear_matches_torch():
    img = _rand((2, 8, 12, 3), 8)
    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    for align in (True, False):
        for out_hw in ((4, 6), (16, 24), (5, 7)):
            got = np.asarray(resize_bilinear(jnp.asarray(img), out_hw, align_corners=align))
            want = F.interpolate(timg, out_hw, mode="bilinear",
                                 align_corners=align).permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(got, want, atol=1e-5,
                                       err_msg=f"align={align} out={out_hw}")


def test_resize_nearest_matches_torch():
    img = _rand((1, 6, 6, 2), 9)
    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    for out_hw in ((3, 3), (12, 12), (9, 4)):
        got = np.asarray(resize_nearest(jnp.asarray(img), out_hw))
        want = F.interpolate(timg, out_hw, mode="nearest").permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_upsample2x_nearest_matches_torch():
    img = _rand((2, 5, 6, 4), 10)
    got = np.asarray(upsample2x_nearest(jnp.asarray(img)))
    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    want = F.interpolate(timg, scale_factor=2, mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
