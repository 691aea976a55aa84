"""Subprocess body for the full 2-D (data=2, cam=3) mesh equivalence test.

Run in a fresh interpreter so the 6-device XLA:CPU collective rendezvous
is not sharing thread pools with the rest of the suite (in-suite runs at
data>1 hit the rendezvous deadline and SIGABRT; see commit 94f98a7).
Prints `L1 <loss>` (single-device) and `L2 <loss>` (sharded) on success.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=6").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vfdepth_tpu.data.fake import FakeDataset  # noqa: E402
from vfdepth_tpu.parallel.mesh import make_mesh_2d, shard_batch_2d  # noqa: E402
from vfdepth_tpu.presets import micro_config  # noqa: E402
from vfdepth_tpu.training.model import VFDepthModel  # noqa: E402
from vfdepth_tpu.training.step import (  # noqa: E402
    build_train_step, create_train_state, shard_train_step_2d)

cfg = micro_config()
model = VFDepthModel(cfg)
ds = FakeDataset(num_samples=2, num_cams=cfg.num_cams, height=cfg.height,
                 width=cfg.width, fusion_level=cfg.fusion_level)
batch = {k: jnp.asarray(v) for k, v in ds.batch([0, 1]).items()}
rng = jax.random.PRNGKey(0)
state, tx = create_train_state(model, rng, batch, steps_per_epoch=10)

step1 = build_train_step(model, tx, donate=False)
_, logs1 = step1(state, batch, rng)
print(f"L1 {float(logs1['total_loss']):.6f}", flush=True)

mesh = make_mesh_2d(2, 3)
step2 = shard_train_step_2d(model, tx, mesh, batch)
_, logs2 = step2(state, shard_batch_2d(mesh, cfg.num_cams, batch), rng)
print(f"L2 {float(logs2['total_loss']):.6f}", flush=True)
