"""Phase decomposition of the decoder's full-res level must equal the dense
formulation EXACTLY (f32), including the reflect-pad borders (which map to
edge pads at half resolution — ops/subpixel.py docstring)."""
import numpy as np
import jax
import jax.numpy as jnp

from vfdepth_tpu.ops.subpixel import (
    phase_upsample_conv3x3,
    phase_conv3x3,
    depth_to_space,
)
from vfdepth_tpu.ops.resize import upsample2x_nearest


def _conv3x3_reflect(x, k, b):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _space_to_depth(x):
    n, h2, w2, c = x.shape
    x = x.reshape(n, h2 // 2, 2, w2 // 2, 2, c)
    return jnp.moveaxis(x, 2, 3).reshape(n, h2 // 2, w2 // 2, 4, c)


def test_phase_upsample_conv_matches_dense():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 6, 9, 5).astype(np.float32))
    k = jnp.asarray(r.randn(3, 3, 5, 7).astype(np.float32) * 0.2)
    b = jnp.asarray(r.randn(7).astype(np.float32))

    dense = _conv3x3_reflect(upsample2x_nearest(x), k, b)
    phased = depth_to_space(phase_upsample_conv3x3(x, k, b))
    np.testing.assert_allclose(np.asarray(phased), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_phase_conv_matches_dense():
    r = np.random.RandomState(1)
    full = jnp.asarray(r.randn(2, 12, 18, 5).astype(np.float32))
    k = jnp.asarray(r.randn(3, 3, 5, 3).astype(np.float32) * 0.2)
    b = jnp.asarray(r.randn(3).astype(np.float32))

    dense = _conv3x3_reflect(full, k, b)
    phased = depth_to_space(phase_conv3x3(_space_to_depth(full), k, b))
    np.testing.assert_allclose(np.asarray(phased), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_depth_to_space_roundtrip():
    r = np.random.RandomState(2)
    full = jnp.asarray(r.randn(1, 8, 10, 4).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(_space_to_depth(full))), np.asarray(full))


def test_chained_phase_level_matches_dense():
    """The full final-level chain: upsample+conv+ELU then conv+sigmoid,
    computed entirely in phase space, must equal the dense chain."""
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(1, 5, 7, 6).astype(np.float32))
    k1 = jnp.asarray(r.randn(3, 3, 6, 4).astype(np.float32) * 0.3)
    b1 = jnp.asarray(r.randn(4).astype(np.float32))
    k2 = jnp.asarray(r.randn(3, 3, 4, 1).astype(np.float32) * 0.3)
    b2 = jnp.asarray(r.randn(1).astype(np.float32))

    dense = jax.nn.sigmoid(_conv3x3_reflect(
        jax.nn.elu(_conv3x3_reflect(upsample2x_nearest(x), k1, b1)), k2, b2))
    p = jax.nn.elu(phase_upsample_conv3x3(x, k1, b1))
    p = jax.nn.sigmoid(phase_conv3x3(p, k2, b2))
    np.testing.assert_allclose(np.asarray(depth_to_space(p)),
                               np.asarray(dense), rtol=1e-5, atol=1e-5)


def test_fusion_decoder_phase_final_matches_dense():
    """FusionDepthDecoder(phase_final=True) must produce the same disparity
    as the dense formulation with the SAME parameters."""
    from vfdepth_tpu.models.decoders import FusionDepthDecoder

    r = np.random.RandomState(4)
    feat = jnp.asarray(r.randn(3, 8, 12, 32).astype(np.float32))
    dec_p = FusionDepthDecoder(level_in=2, num_ch_enc=[16, 24, 32],
                               scales=(0,), phase_final=True)
    params = dec_p.init(jax.random.PRNGKey(0), [feat])["params"]
    dec_d = FusionDepthDecoder(level_in=2, num_ch_enc=[16, 24, 32],
                               scales=(0,), phase_final=False)
    out_p = dec_p.apply({"params": params}, [feat])["disp/0"]
    out_d = dec_d.apply({"params": params}, [feat])["disp/0"]
    assert out_p.shape == out_d.shape == (3, 64, 96, 1)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               rtol=1e-5, atol=1e-6)
