"""Subprocess body for the 2-process multi-host training test.

Run as: python tests/helpers_dist_train.py <process_id> <port>
Initializes jax.distributed on localhost (CPU, 1 device per process), checks
the loader's DistributedSampler-equivalent sharding UNDER SHUFFLE (host-
invariant permutation, disjoint shards whose union is the dataset — the
reference's DistributedSampler + set_epoch semantics,
``models/vfdepth.py:117-125``), runs ONE sharded train step over the
2-process global mesh and prints the loss as ``LOSS <value>``, then drives
the full ``Trainer.learn`` loop for one epoch with the logging checkpoint
cadence hitting step 0 — covering the pod-safe train-panel skip and the
multi-host ``_build_step`` path — and prints ``TRAINER_OK``.
"""
import os
import sys
import tempfile

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

import numpy as np  # noqa: E402
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

# --- shard semantics under shuffle (the round-2 bug): the permutation seed
# is HOST-INVARIANT, so every process draws the same epoch permutation and
# the contiguous shard slices partition the dataset disjointly.
SEED = 42
shard_sets = []
for s in range(2):
    probe = BatchLoader(ds, batch_size=1, shuffle=True, num_workers=0,
                        seed=SEED, shard_index=s, num_shards=2)
    probe.set_epoch(0)
    shard_sets.append(set(int(i) for i in probe._epoch_indices()))
assert shard_sets[0].isdisjoint(shard_sets[1]), shard_sets
assert shard_sets[0] | shard_sets[1] == set(range(len(ds))), shard_sets

loader = BatchLoader(ds, batch_size=1, shuffle=True, num_workers=0,
                     seed=SEED, shard_index=shard_index, num_shards=num_shards)
loader.set_epoch(0)
local = next(iter(loader))
# this process's sample is perm[pid] of the shared permutation
perm = np.random.RandomState(SEED + 0).permutation(len(ds))
expect = ds[int(perm[pid])]
np.testing.assert_allclose(local["color/0/0"][0], expect["color/0/0"])

rng = jax.random.PRNGKey(0)
init_batch = {k: jnp.asarray(v) for k, v in local.items()}
state, tx = create_train_state(model, rng, init_batch, steps_per_epoch=10)
mesh = make_mesh()
step_fn, _ = shard_train_step(model, tx, mesh=mesh)
gbatch = shard_batch(mesh, local)
state, logs = step_fn(state, gbatch, rng)
print(f"LOSS {float(logs['total_loss']):.6f}", flush=True)

# --- full Trainer loop on the pod: log checkpoint at step 0 exercises the
# train-panel path (must NOT run a process-0-only collective — the round-2
# hang), scalar logging, and the multi-host _build_step branch.
from vfdepth_tpu.training.trainer import Trainer  # noqa: E402

tmp = tempfile.mkdtemp(prefix=f"dist_train_p{pid}_")
cfg.set("log_path", os.path.join(tmp, "log"))
# the checkpoint root must be SHARED across processes: orbax's multihost
# save protocol (primary-host write + commit + global barriers) assumes one
# logical checkpoint directory, exactly like a pod writing to shared
# storage. Per-process roots deadlock the _async_write_complete barrier.
shared = os.path.join(tempfile.gettempdir(), f"dist_train_shared_{port}")
cfg.set("save_weights_root", os.path.join(shared, "models"))
cfg.set("log_frequency", 1)
cfg.set("early_phase", 10)
cfg.set("late_log_frequency", 10)
cfg.set("batch_size", 1)  # per-host batch
trainer = Trainer(cfg, VFDepthModel(cfg), use_tb=(pid == 0))
trainer.learn(loader, val_loader=None, max_steps=1)
print("TRAINER_OK", flush=True)
