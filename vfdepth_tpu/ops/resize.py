"""Image resizing as separable matmuls (MXU-friendly).

Instead of gather-based interpolation, resizing with static shapes is expressed
as two small dense contractions ``out = A_h @ img @ A_w^T`` whose weight
matrices are computed host-side with numpy. XLA fuses these into efficient MXU
work, and the approach sidesteps TPU-unfriendly dynamic gathers entirely.

Semantics covered (both used by the reference):
  * bilinear, ``align_corners=True``  (feature aggregation, masks —
    reference ``network/fusion_depthnet.py:60-62``, ``volumetric_fusionnet.py:129``)
  * bilinear, ``align_corners=False`` (disp -> full-res upsample —
    reference ``models/vfdepth.py:283``, eval resize ``utils/logger.py:217``)
  * nearest x2 upsample (decoder upsampling — reference ``network/blocks.py:34-38``)
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Interpolation weights are exact per-pixel affine combinations; run the tiny
# weight matmuls at full f32 precision so results match torch bit-closely
# (XLA's default matmul precision may use bf16 passes).
_HIGHEST = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _linear_resize_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """[out_size, in_size] row-stochastic bilinear interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    out_idx = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        src = out_idx * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = np.clip((out_idx + 0.5) * scale - 0.5, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), 1.0 - w_hi)
    np.add.at(mat, (rows, hi), w_hi)
    return mat


@functools.lru_cache(maxsize=None)
def _nearest_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] one-hot nearest matrix (torch 'nearest' = floor)."""
    out_idx = np.arange(out_size, dtype=np.float64)
    src = np.minimum(np.floor(out_idx * (in_size / out_size)), in_size - 1).astype(np.int64)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    mat[np.arange(out_size), src] = 1.0
    return mat


def resize_bilinear(img: jnp.ndarray, out_hw, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of NHWC-style input [..., H, W, C] to [..., H', W', C]."""
    out_h, out_w = out_hw
    in_h, in_w = img.shape[-3], img.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return img
    mat_h = jnp.asarray(_linear_resize_matrix(in_h, out_h, align_corners), dtype=img.dtype)
    mat_w = jnp.asarray(_linear_resize_matrix(in_w, out_w, align_corners), dtype=img.dtype)
    out = jnp.einsum("oh,...hwc->...owc", mat_h, img, precision=_HIGHEST)
    out = jnp.einsum("pw,...owc->...opc", mat_w, out, precision=_HIGHEST)
    return out


def resize_nearest(img: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest resize of [..., H, W, C] (torch F.interpolate mode='nearest')."""
    out_h, out_w = out_hw
    in_h, in_w = img.shape[-3], img.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return img
    mat_h = jnp.asarray(_nearest_resize_matrix(in_h, out_h), dtype=img.dtype)
    mat_w = jnp.asarray(_nearest_resize_matrix(in_w, out_w), dtype=img.dtype)
    out = jnp.einsum("oh,...hwc->...owc", mat_h, img, precision=_HIGHEST)
    out = jnp.einsum("pw,...owc->...opc", mat_w, out, precision=_HIGHEST)
    return out


def upsample2x_nearest(img: jnp.ndarray) -> jnp.ndarray:
    """Nearest x2 upsample of [..., H, W, C] via broadcast-reshape (no gather)."""
    h, w, c = img.shape[-3], img.shape[-2], img.shape[-1]
    lead = img.shape[:-3]
    out = img[..., :, None, :, None, :]
    out = jnp.broadcast_to(out, lead + (h, 2, w, 2, c))
    return out.reshape(lead + (2 * h, 2 * w, c))
