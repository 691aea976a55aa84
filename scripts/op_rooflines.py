"""Per-op roofline microbenchmarks for the step's >10 ms ops.

Measures, at the EXACT shapes of the 301 ms-step profile's top ops
(docs/PERF.md, round-4 profile), what the primitive underneath each op can
do in isolation on this chip:

  * 3D frustum forward  (fusion.3,  16.4 ms in-step): XLA row-gather
    bf16[200000,512] rows at s32[1152000] indices -> rows/s + GB/s.
  * 3D frustum backward (fusion.10, 25.7 ms in-step): XLA scatter-add of
    bf16[1152000,512] rows into [200000,512] -> rows/s + GB/s.
  * merged back-projection fwd/bwd (jvp__.8 22.4 / transpose_jvp 30.1 ms):
    dense bf16 matmuls with the kernel's LIVE-BAND MAC count
    (~1.3 x 16-row x 80-col bands per 256-point sub-tile, N=770) -> the
    MXU-bound floor for the same contraction done with zero overhead.
  * dense-equivalent HBM streams for the warp transpose shape.

Run on the TPU chip: python scripts/op_rooflines.py
Prints a markdown table to stdout (paste into docs/PERF.md).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N_PTS = 1_152_000     # frustum points (6 cams x 48x80 x 50 bins)
N_VOX = 200_000       # voxel rows (100x100x20)
C_OCT = 512           # oct-packed channels (8 taps x 64)
REPS = 20


def _sync(out):
    """Force REAL completion of all enqueued device work.

    Through the axon tunnel ``block_until_ready`` returns before the remote
    execution finishes (measured: a 2.4 GB gather 'completed' in 34 us —
    physically impossible), so sync by fetching ONE element of the output:
    the slice computation enqueues after everything already queued on the
    single serialized device stream, and the host fetch cannot return
    before its input data exists."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0].astype(jnp.float32))


def timeit(fn, *args):
    out = fn(*args)   # compile + warmup
    _sync(out)
    # dispatch/sync overhead: time the sync of an already-materialized array
    t0 = time.time()
    _sync(out)
    overhead = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _sync(out)
    return max((time.time() - t0 - overhead), 1e-9) / REPS * 1e3  # ms


def main():
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, N_VOX, N_PTS).astype(np.int32))
    vol = jnp.asarray(rng.randn(N_VOX, C_OCT).astype(np.float32),
                      dtype=jnp.bfloat16)
    gout = jnp.asarray(rng.randn(N_PTS, C_OCT).astype(np.float32),
                       dtype=jnp.bfloat16)

    rows = []

    # --- gather (fusion.3 equivalent) -----------------------------------
    gather = jax.jit(lambda v, i: jnp.take(v, i, axis=0))
    ms = timeit(gather, vol, idx)
    gb = N_PTS * C_OCT * 2 * 2 / 1e9  # read + write
    rows.append(("3D fwd gather", "fusion.3", 16.4, ms,
                 f"{N_PTS / ms / 1e3:.0f}M rows/s, {gb / ms * 1e3:.0f} GB/s"))

    # sorted-index variant: does XLA exploit locality?
    idx_sorted = jnp.sort(idx)
    ms_s = timeit(gather, vol, idx_sorted)
    rows.append(("3D fwd gather (pre-sorted idx)", "-", None, ms_s,
                 f"{N_PTS / ms_s / 1e3:.0f}M rows/s"))

    # --- scatter-add (fusion.10 equivalent) ------------------------------
    @jax.jit
    def scatter(g, i):
        return jnp.zeros((N_VOX, C_OCT), jnp.bfloat16).at[i].add(g)

    ms = timeit(scatter, gout, idx)
    rows.append(("3D bwd scatter-add", "fusion.10", 25.7, ms,
                 f"{N_PTS / ms / 1e3:.0f}M rows/s"))
    ms_s = timeit(scatter, gout, idx_sorted)
    rows.append(("3D bwd scatter-add (pre-sorted idx)", "-", None, ms_s,
                 f"{N_PTS / ms_s / 1e3:.0f}M rows/s"))

    # f32 accumulate variant (scatter in f32, cast after)
    @jax.jit
    def scatter32(g, i):
        acc = jnp.zeros((N_VOX, C_OCT), jnp.float32).at[i].add(
            g.astype(jnp.float32))
        return acc.astype(jnp.bfloat16)

    ms32 = timeit(scatter32, gout, idx)
    rows.append(("3D bwd scatter-add (f32 acc)", "-", None, ms32,
                 f"{N_PTS / ms32 / 1e3:.0f}M rows/s"))

    # --- back-projection MXU floor ---------------------------------------
    # live-band contraction MACs: per 256-pt sub-tile ~1.3 bands of 16x80
    # source rows (ops/pallas_sample.py header); merged N=770, 2 frame
    # groups x 200k voxels points. Dense-equivalent: [400000, 1664]@[1664,770]
    m, k, n = 400_000, 1664, 770
    a = jnp.asarray(rng.randn(m, k).astype(np.float32), dtype=jnp.bfloat16)
    b = jnp.asarray(rng.randn(k, n).astype(np.float32), dtype=jnp.bfloat16)
    mm = jax.jit(lambda x, y: x @ y)
    ms = timeit(mm, a, b)
    fl = 2 * m * k * n
    rows.append(("back-proj fwd MAC floor (dense MXU)", "jvp__.8", 22.4, ms,
                 f"{fl / ms / 1e9:.0f} GFLOP in {ms:.1f} ms = "
                 f"{fl / ms * 1e3 / 1e12:.0f} TF/s"))

    # backward: dimg[p,c] = W^T g -> [3840, 400000] x [400000, 770] banded;
    # same MAC count as forward
    rows.append(("back-proj bwd MAC floor", "transpose_jvp.1", 30.1, ms,
                 "same contraction transposed"))

    # --- warp transpose shape stream -------------------------------------
    x = jnp.asarray(rng.randn(6, 3840, 768).astype(np.float32),
                    dtype=jnp.bfloat16)
    copy = jax.jit(lambda v: v * jnp.bfloat16(1.0000001))
    ms = timeit(copy, x)
    gb = x.size * 2 * 2 / 1e9
    rows.append(("bf16[6,3840,768] stream (rd+wr)", "transpose_jvp.1 out",
                 None, ms, f"{gb / ms * 1e3:.0f} GB/s"))

    print("| primitive | in-step op | in-step ms | isolated ms | rate |")
    print("|---|---|---|---|---|")
    for name, op, instep, ms, rate in rows:
        instep_s = f"{instep}" if instep else "-"
        print(f"| {name} | {op} | {instep_s} | {ms:.1f} | {rate} |")


if __name__ == "__main__":
    main()
