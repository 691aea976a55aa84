"""Phase (sub-pixel) decomposition of the decoder's full-resolution level.

The decoder's last level (reference ``fusion_depthnet.py:131-145``: nearest
2x upsample -> 3x3 reflect-pad conv (16 ch) -> ELU -> 3x3 disp conv ->
sigmoid) streams several full-resolution 16-channel tensors. Under TPU
tiling a [N, H, W, 16] bf16 tensor pads its 16-lane minor dim to 128 —
an ~8x HBM inflation that makes this level's pad/conv chaff cost
~10-14 ms/step at DDAD shapes (docs/PERF.md round-4 tail tables).

Both convs restructure EXACTLY into half-resolution convs over the four
output phases (py, px) = (row parity, col parity):

  * conv3x3(upsample2x_nearest(x)): an output pixel (2i+py, 2j+px) reads
    upsampled rows 2i+py+u, u in {-1,0,1}, which collapse onto HALF-res
    rows i + floor((py+u)/2) — a 2x2 footprint whose per-phase kernel sums
    the taps that land on the same source pixel (``_collapse_axis``).
  * conv3x3 on an already-phase-decomposed tensor: full-res row 2i+py'+u
    = phase (py'+u) mod 2 at half-res row i + floor((py'+u)/2) — a 2x2
    conv over the 4C phase channels (``phase_conv3x3``).

Boundary exactness: the full-res REFLECT pad maps to an EDGE (replicate)
pad at half resolution — reflected full row -1 is full row 1, whose
half-res source under nearest upsampling is row 0 (and likewise, a phase
plane's reflected neighbor is the OTHER parity plane at the edge row,
which the phase-channel kernels read via the same edge pad). Equality
with the dense formulation is test-guarded to f32 exactness
(tests/test_subpixel.py).

The result: the whole level runs at half resolution with 64 phase
channels (full 128-lane tiles at C=16), and only the final 1-channel
disparity is ever materialized at full resolution.
"""
from __future__ import annotations

import jax.numpy as jnp


def _collapse_axis(k: jnp.ndarray, phase: int) -> jnp.ndarray:
    """Collapse a 3-tap conv axis over nearest-2x upsampling for one output
    parity: [3, ...] -> [2, ...] (taps landing on the same source pixel
    sum). phase 0: {k0 | k1+k2}; phase 1: {k0+k1 | k2}."""
    if phase == 0:
        return jnp.stack([k[0], k[1] + k[2]], axis=0)
    return jnp.stack([k[0] + k[1], k[2]], axis=0)


def phase_upsample_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                           bias: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """conv3x3_reflect(upsample2x_nearest(x)) computed per output phase.

    x: [N, H, W, Cin] (HALF resolution); kernel: [3, 3, Cin, Cout]; returns
    [N, H, W, 4, Cout] with the phase axis ordered (py, px) row-major —
    ``depth_to_space`` reassembles the [N, 2H, 2W, Cout] dense result.
    """
    import jax

    dt = dtype or x.dtype
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    h, w = x.shape[1], x.shape[2]
    outs = []
    for py in (0, 1):
        ky = _collapse_axis(kernel, py)                  # [2, 3, Cin, Cout]
        for px in (0, 1):
            kxy = jnp.swapaxes(
                _collapse_axis(jnp.swapaxes(ky, 0, 1), px), 0, 1)
            win = xp[:, py:py + h + 1, px:px + w + 1, :]
            y = jax.lax.conv_general_dilated(
                win.astype(dt), kxy.astype(dt), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            outs.append(y + bias.astype(dt))
    return jnp.stack(outs, axis=-2)                      # [N, H, W, 4, Cout]


def phase_conv3x3(phases: jnp.ndarray, kernel: jnp.ndarray,
                  bias: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """conv3x3_reflect on the FULL-RES tensor represented by ``phases``.

    phases: [N, H, W, 4, C] ((py, px) row-major); kernel: [3, 3, C, Cout];
    returns [N, H, W, 4, Cout]. Full-res row 2i+py'+u lives in phase plane
    (py'+u) mod 2 at half-res row i + floor((py'+u)/2); the reflect border
    becomes an edge pad of the phase tensor (module docstring).
    """
    import jax

    dt = dtype or phases.dtype
    n, h, w, _, c = phases.shape
    flat = phases.reshape(n, h, w, 4 * c)
    xp = jnp.pad(flat, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    cout = kernel.shape[-1]

    outs = []
    for pyp in (0, 1):
        for pxp in (0, 1):
            # assemble the [2, 2, 4C, Cout] kernel: full-res tap (u, v) ->
            # phase plane ((pyp+u)%2, (pxp+v)%2) at window offset
            # (floor((pyp+u)/2)+1, ...) within the {off, off+1} slice
            kq = jnp.zeros((2, 2, 4, c, cout), kernel.dtype)
            for ui, u in enumerate((-1, 0, 1)):
                py = (pyp + u) % 2
                dy = (pyp + u - py) // 2   # half-res offset in {-1, 0, 1}
                for vi, v in enumerate((-1, 0, 1)):
                    px = (pxp + v) % 2
                    dx = (pxp + v - px) // 2
                    # window slice offset: pyp==0 covers dy in {-1,0}
                    # (slice offset 0), pyp==1 covers {0,1} (offset 1)
                    wy = dy + (1 if pyp == 0 else 0)
                    wx = dx + (1 if pxp == 0 else 0)
                    kq = kq.at[wy, wx, py * 2 + px].add(kernel[ui, vi])
            win = xp[:, pyp:pyp + h + 1, pxp:pxp + w + 1, :]
            y = jax.lax.conv_general_dilated(
                win.astype(dt), kq.reshape(2, 2, 4 * c, cout).astype(dt),
                (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            outs.append(y + bias.astype(dt))
    return jnp.stack(outs, axis=-2)


def depth_to_space(phases: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, 4, C] ((py, px) row-major phases) -> [N, 2H, 2W, C]."""
    n, h, w, _, c = phases.shape
    x = phases.reshape(n, h, w, 2, 2, c)
    x = jnp.moveaxis(x, 3, 2)          # [N, H, 2, W, 2, C]
    return x.reshape(n, 2 * h, 2 * w, c)
