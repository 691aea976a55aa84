"""Native C++ image-op tests (build + parity vs torch bilinear)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vfdepth_tpu.native import get_lib, resize_batch


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def test_resize_f32_matches_torch():
    rng = np.random.RandomState(0)
    imgs = rng.rand(3, 37, 53, 3).astype(np.float32)
    got = resize_batch(imgs, (24, 40), n_threads=2)
    want = F.interpolate(torch.from_numpy(imgs).permute(0, 3, 1, 2), (24, 40),
                         mode="bilinear", align_corners=False,
                         ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_resize_u8_normalizes():
    rng = np.random.RandomState(1)
    imgs = (rng.rand(2, 16, 20, 3) * 255).astype(np.uint8)
    got = resize_batch(imgs, (8, 10))
    assert got.dtype == np.float32
    assert got.max() <= 1.0 and got.min() >= 0.0
    want = F.interpolate(torch.from_numpy(imgs.astype(np.float32) / 255.0
                                          ).permute(0, 3, 1, 2), (8, 10),
                         mode="bilinear", align_corners=False,
                         ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_resize_identity():
    imgs = np.random.RandomState(2).rand(1, 8, 8, 2).astype(np.float32)
    got = resize_batch(imgs, (8, 8))
    np.testing.assert_allclose(got, imgs, atol=1e-6)
