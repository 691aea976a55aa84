"""Pose-path BEV relayout as a Pallas copy kernel.

The pose branch must fold the voxel volume's z-axis into conv channels and
split the frame-group axis into the batch (reference 2D form
``network/volumetric_fusionnet.py:54-56,338-343``):

    [b, n = vz*vy*vx, G, C]  ->  [G*b, vy, vx, vz*C]

This is a pure permutation of ~103M bf16 elements (0.2 GB read + write,
~1 ms of HBM bandwidth), but XLA lowers the composed transpose as a chunked
while-loop + dynamic-update-slices running at ~5% of bandwidth — 13 ms/step
measured fwd+bwd in-model (docs/PERF.md round-3 profile: while.50/51 +
dynamic-update-slice.150/151). Every alternative XLA formulation tried
(per-z concatenate, optimization-barrier'd update-slices, z-window 3D
grouped conv) canonicalized back to the same while-loop or lost more to 5D
conv layout copies than it saved.

This kernel streams the permutation at bandwidth: every block it moves is a
contiguous [rows, C] slab, sliced along the lane axis in C-sized chunks
(the grid walks groups) and re-deposited at z*C channel offsets. The one
alignment constraint: the per-(z, group) channel chunk ``C`` must be a
multiple of 128 lanes. The pose feature width is 256, but the voxel
features carry ONE extra shared rel-depth channel (257 per group) — the
caller therefore splits that channel off and feeds it to the reduce conv as
a separately-weighted partial conv (channel partitioning of a conv is
exact: conv(concat(a, b), [wa; wb]) == conv(a, wa) + conv(b, wb)), keeping
this kernel fully aligned.

Gradient: the fold is linear, so the VJP is the inverse relayout (same
kernel structure, reversed block specs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _fwd_kernel(vz, in_ref, out_ref):
    # in  [1, vz, YT, vx, cm] -> out [1, YT, vx, vz*cm]
    cm = in_ref.shape[-1]
    for z in range(vz):
        out_ref[0, :, :, z * cm:(z + 1) * cm] = in_ref[0, z]


def _bwd_kernel(vz, g_ref, out_ref):
    # g [1, YT, vx, vz*cm] -> out [1, vz, YT, vx, cm]
    cm = out_ref.shape[-1]
    for z in range(vz):
        out_ref[0, z] = g_ref[0, :, :, z * cm:(z + 1) * cm]


@functools.lru_cache(maxsize=None)
def _make_op(b, vz, vy, vx, g, cm, dtype_name):
    dtype = jnp.dtype(dtype_name)
    # y-rows per grid step: in+out blocks are ~2*vz*vx*cm bytes*itemsize per
    # row; stay well under VMEM with double buffering
    yt = 1
    for cand in (4, 2):
        if vy % cand == 0 and 2 * 2 * cand * vz * vx * cm * dtype.itemsize \
                <= 10 * 2 ** 20:
            yt = cand
            break
    grid = (b, g, vy // yt)
    interp = jax.default_backend() != "tpu"

    def fwd_call(x):
        # x [b, vz, vy, vx, G*cm]; the G axis is walked as cm-sized blocks
        # of the lane dim (aligned: cm % 128 == 0 on TPU)
        return pl.pallas_call(
            functools.partial(_fwd_kernel, vz),
            grid=grid,
            in_specs=[pl.BlockSpec(
                (1, vz, yt, vx, cm),
                lambda ib, ig, iy: (ib, 0, iy, 0, ig))],
            out_specs=pl.BlockSpec(
                (1, yt, vx, vz * cm),
                lambda ib, ig, iy: (ig * b + ib, iy, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((g * b, vy, vx, vz * cm), dtype),
            interpret=interp,
        )(x)

    def bwd_call(gout):
        return pl.pallas_call(
            functools.partial(_bwd_kernel, vz),
            grid=grid,
            in_specs=[pl.BlockSpec(
                (1, yt, vx, vz * cm),
                lambda ib, ig, iy: (ig * b + ib, iy, 0, 0))],
            out_specs=pl.BlockSpec(
                (1, vz, yt, vx, cm),
                lambda ib, ig, iy: (ib, 0, iy, 0, ig)),
            out_shape=jax.ShapeDtypeStruct((b, vz, vy, vx, g * cm), dtype),
            interpret=interp,
        )(gout)

    @jax.custom_vjp
    def op(x):
        return fwd_call(x)

    op.defvjp(lambda x: (fwd_call(x), None),
              lambda _, gout: (bwd_call(gout),))
    return op


def fold_zc(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[b, vz, vy, vx, G*C] (channel chunks group-major: (G, C)) ->
    [G*b, vy, vx, vz*C] (group-major batch, z-major channels) — exactly
    ``moveaxis(reshape(..., G, C), -2, 0)`` + z-into-channels.

    C = last_dim / groups must be a multiple of 128 on TPU (lane
    alignment); the caller guards via ``fold_zc_supported``.
    """
    b, vz, vy, vx, gcm = x.shape
    cm = gcm // groups
    return _make_op(b, vz, vy, vx, groups, cm, x.dtype.name)(x)


def fold_zc_supported(cm: int) -> bool:
    """True when the channel chunk is lane-aligned for the TPU kernel."""
    return cm % 128 == 0 or jax.default_backend() != "tpu"
