"""Subprocess body for the 2-process multi-host training test.

Run as: python tests/helpers_dist_train.py <process_id> <port>
Initializes jax.distributed on localhost (CPU, 1 device per process), loads
this process's loader shard of the fake dataset, runs ONE sharded train step
over the 2-process global mesh, and prints the loss as `LOSS <value>`.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["VFDEPTH_COORDINATOR"] = f"localhost:{port}"
os.environ["VFDEPTH_NUM_PROCESSES"] = "2"
os.environ["VFDEPTH_PROCESS_ID"] = str(pid)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from vfdepth_tpu.parallel.distributed import (  # noqa: E402
    loader_shard, maybe_initialize_distributed)

maybe_initialize_distributed()
assert jax.process_count() == 2, jax.process_count()
shard_index, num_shards = loader_shard()
assert (shard_index, num_shards) == (pid, 2)

import jax.numpy as jnp  # noqa: E402

from vfdepth_tpu.data.fake import FakeDataset  # noqa: E402
from vfdepth_tpu.data.loader import BatchLoader  # noqa: E402
from vfdepth_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: E402
from vfdepth_tpu.presets import micro_config  # noqa: E402
from vfdepth_tpu.training.model import VFDepthModel  # noqa: E402
from vfdepth_tpu.training.step import (  # noqa: E402
    create_train_state, shard_train_step)

cfg = micro_config(depth_model="fsm", pose_model="fsm")
model = VFDepthModel(cfg)
ds = FakeDataset(num_samples=2, num_cams=cfg.num_cams, height=cfg.height,
                 width=cfg.width, fusion_level=cfg.fusion_level)
loader = BatchLoader(ds, batch_size=1, shuffle=False, num_workers=0,
                     shard_index=shard_index, num_shards=num_shards)
local = next(iter(loader))
# shards must be disjoint: process p sees sample p (shuffle off)
import numpy as np  # noqa: E402

expect = ds[pid]
np.testing.assert_allclose(local["color/0/0"][0], expect["color/0/0"])

rng = jax.random.PRNGKey(0)
init_batch = {k: jnp.asarray(v) for k, v in local.items()}
state, tx = create_train_state(model, rng, init_batch, steps_per_epoch=10)
mesh = make_mesh()
step_fn, _ = shard_train_step(model, tx, mesh=mesh)
gbatch = shard_batch(mesh, local)
state, logs = step_fn(state, gbatch, rng)
print(f"LOSS {float(logs['total_loss']):.6f}", flush=True)
