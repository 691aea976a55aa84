"""Measure the depth-synthesis sweep wall time (eval-time visualization).

The reference decodes ~788 scripted viewpoints in a per-view Python loop
(volumetric_fusionnet.py:320-335) — one host<->device round trip per view.
Ours fuses the voxel volume once and decodes vmapped chunks of 16.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vfdepth_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from vfdepth_tpu.presets import ddad_bench_config  # noqa: E402
from vfdepth_tpu.data.fake import FakeDataset  # noqa: E402
from vfdepth_tpu.training.model import VFDepthModel  # noqa: E402
from vfdepth_tpu.training.synthesis import synthesize_sweep  # noqa: E402


def main():
    cfg = ddad_bench_config(batch_size=1, mixed_precision=True)
    model = VFDepthModel(cfg)
    ds = FakeDataset(num_samples=1, num_cams=6, height=384, width=640,
                     fusion_level=2)
    batch = {k: jnp.asarray(v) for k, v in ds.batch([0]).items()}
    rng = jax.random.PRNGKey(0)
    params, stats = model.init(rng, batch)

    t0 = time.time()
    disps = synthesize_sweep(model, params, stats, batch, max_views=32, chunk=16)
    print(f"warmup (32 views, compile included): {time.time()-t0:.1f}s",
          flush=True)
    t0 = time.time()
    disps = synthesize_sweep(model, params, stats, batch, chunk=16)
    dt = time.time() - t0
    print(f"full sweep: {len(disps)} views in {dt:.2f}s "
          f"({dt / len(disps) * 1000:.1f} ms/view)", flush=True)


if __name__ == "__main__":
    main()
