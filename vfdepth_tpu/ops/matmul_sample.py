"""Bilinear sampling as one-hot matmuls (MXU-native, scatter-free).

Motivation (measured on TPU v5e, batch 1 x 6 cams, 200k voxels x 257 ch):
XLA's gather forward runs ~61 ms and its scatter-add backward ~120 ms with a
~450 s compile — scatters are the pathological op on TPU. The voxel
back-projection samples from a SMALL source (the fusion-level feature map,
48x80 = 3840 pixels), so interpolation can instead be written as a dense
matmul against a 4-tap one-hot weight matrix built on the fly:

    out[n, c]  = sum_p W[n, p] * img[p, c]         (forward)
    dimg[p, c] = sum_n W[n, p] * g[n, c]           (backward = W^T @ g)

W chunks are built with broadcasted-iota comparisons and consumed
immediately; both directions are MXU matmuls, compile in seconds, and run at
~flops/bandwidth speed. Sample coordinates are treated as non-differentiable
(in the back-projection they come from calibration constants — reference
``network/volumetric_fusionnet.py:132-143`` takes no coordinate gradients).

Use ``sample_bilinear_mm`` when the source spatial extent is small (<= ~8k
pixels); use ``ops.grid_sample`` otherwise (e.g. full-res image warps).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# chunk of sample points per matmul; W chunk = CHUNK x HW bf16 stays modest
_CHUNK = 2048


def _tap_weights(coords: jnp.ndarray, h: int, w: int):
    """Normalized coords [..., 2] -> per-tap flat indices + weights.

    align_corners=True, zeros padding: out-of-bounds taps get weight 0.
    Returns (idx [..., 4], weight [..., 4]) with idx clipped in-range.
    """
    finite = jnp.all(jnp.isfinite(coords), axis=-1)
    coords = jnp.where(finite[..., None], coords, -2.0)
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    taps = []
    for dy, dx, wgt in ((0, 0, (1 - wx) * (1 - wy)), (0, 1, wx * (1 - wy)),
                        (1, 0, (1 - wx) * wy), (1, 1, wx * wy)):
        ix = ix0 + dx
        iy = iy0 + dy
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        taps.append((idx, wgt * valid.astype(wgt.dtype)))
    idx = jnp.stack([t[0] for t in taps], axis=-1)
    wgt = jnp.stack([t[1] for t in taps], axis=-1)
    return idx, wgt


def _onehot_w(idx: jnp.ndarray, wgt: jnp.ndarray, hw: int,
              dtype) -> jnp.ndarray:
    """[..., n, 4] taps -> dense W [..., n, hw] (sum of weighted one-hots).

    Accumulated tap by tap so no [..., n, 4, hw] intermediate exists.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)  # [1, hw]
    w_mat = None
    for t in range(idx.shape[-1]):
        oh = (idx[..., t, None] == iota).astype(dtype) * wgt[..., t, None].astype(dtype)
        w_mat = oh if w_mat is None else w_mat + oh
    return w_mat


def _pad_to_chunks(x: jnp.ndarray, axis: int, chunk: int):
    n = x.shape[axis]
    pad = (-n) % chunk
    if pad:
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, pad)
        x = jnp.pad(x, cfg)
    return x, n


def _forward(img_flat: jnp.ndarray, idx: jnp.ndarray, wgt: jnp.ndarray,
             mm_dtype) -> jnp.ndarray:
    """img_flat [B, HW, C], idx/wgt [B, N, 4] -> out [B, N, C] (f32)."""
    b, hw, c = img_flat.shape
    idx_p, n = _pad_to_chunks(idx, 1, _CHUNK)
    wgt_p, _ = _pad_to_chunks(wgt, 1, _CHUNK)
    n_chunks = idx_p.shape[1] // _CHUNK
    img_mm = img_flat.astype(mm_dtype)

    def body(_, chunk_in):
        idx_c, wgt_c = chunk_in  # [B, CHUNK, 4]
        w_mat = _onehot_w(idx_c, wgt_c, hw, mm_dtype)  # [B, CHUNK, hw]
        out_c = jnp.einsum("bnp,bpc->bnc", w_mat, img_mm,
                           preferred_element_type=jnp.float32)
        return None, out_c

    idx_s = idx_p.reshape(b, n_chunks, _CHUNK, 4).swapaxes(0, 1)
    wgt_s = wgt_p.reshape(b, n_chunks, _CHUNK, 4).swapaxes(0, 1)
    _, outs = jax.lax.scan(body, None, (idx_s, wgt_s))
    out = outs.swapaxes(0, 1).reshape(b, n_chunks * _CHUNK, c)
    return out[:, :n]


def _backward(g: jnp.ndarray, idx: jnp.ndarray, wgt: jnp.ndarray, hw: int,
              mm_dtype) -> jnp.ndarray:
    """g [B, N, C] -> dimg [B, HW, C] via W^T @ g, accumulated over chunks."""
    b, n, c = g.shape
    g_p, _ = _pad_to_chunks(g, 1, _CHUNK)
    idx_p, _ = _pad_to_chunks(idx, 1, _CHUNK)
    wgt_p, _ = _pad_to_chunks(wgt, 1, _CHUNK)
    n_chunks = g_p.shape[1] // _CHUNK

    def body(acc, chunk_in):
        g_c, idx_c, wgt_c = chunk_in
        w_mat = _onehot_w(idx_c, wgt_c, hw, mm_dtype)  # [B, CHUNK, hw]
        acc = acc + jnp.einsum("bnp,bnc->bpc", w_mat, g_c.astype(mm_dtype),
                               preferred_element_type=jnp.float32)
        return acc, None

    g_s = g_p.reshape(b, n_chunks, _CHUNK, c).swapaxes(0, 1)
    idx_s = idx_p.reshape(b, n_chunks, _CHUNK, 4).swapaxes(0, 1)
    wgt_s = wgt_p.reshape(b, n_chunks, _CHUNK, 4).swapaxes(0, 1)
    acc0 = jnp.zeros((b, hw, c), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (g_s, idx_s, wgt_s))
    return acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sample_mm(img: jnp.ndarray, coords: jnp.ndarray, mm_bf16: bool):
    h, w = img.shape[-3], img.shape[-2]
    idx, wgt = _tap_weights(coords, h, w)
    img_flat = img.reshape(img.shape[:-3] + (h * w, img.shape[-1]))
    mm_dtype = jnp.bfloat16 if mm_bf16 else jnp.float32
    return _forward(img_flat, idx, wgt, mm_dtype).astype(img.dtype)


def _sample_mm_fwd(img, coords, mm_bf16):
    h, w = img.shape[-3], img.shape[-2]
    idx, wgt = _tap_weights(coords, h, w)
    img_flat = img.reshape(img.shape[:-3] + (h * w, img.shape[-1]))
    mm_dtype = jnp.bfloat16 if mm_bf16 else jnp.float32
    out = _forward(img_flat, idx, wgt, mm_dtype).astype(img.dtype)
    return out, (idx, wgt, img.shape)


def _sample_mm_bwd(mm_bf16, res, g):
    idx, wgt, img_shape = res
    h, w, c = img_shape[-3], img_shape[-2], img_shape[-1]
    mm_dtype = jnp.bfloat16 if mm_bf16 else jnp.float32
    dimg_flat = _backward(g, idx, wgt, h * w, mm_dtype)
    dimg = dimg_flat.reshape(img_shape).astype(g.dtype)
    return dimg, jnp.zeros(idx.shape[:-1] + (2,), g.dtype)


_sample_mm.defvjp(_sample_mm_fwd, _sample_mm_bwd)


def sample_bilinear_mm(img: jnp.ndarray, coords: jnp.ndarray,
                       mm_bf16: bool = True) -> jnp.ndarray:
    """Bilinear grid sample via one-hot matmuls.

    Args:
      img: [B, H, W, C] (H*W should be small, e.g. the fusion feature map).
      coords: [B, N, 2] normalized (x, y), align_corners=True convention.
      mm_bf16: run the one-hot matmuls in bf16 (f32 accumulation). The
        interpolation weights lose ~3 decimal digits; features tolerate it.
    Returns: [B, N, C]; gradients flow to ``img`` only (coords treated
    as constants, matching the back-projection's usage).
    """
    return _sample_mm(img, coords, mm_bf16)
