"""Profile the training step and print the top ops by device time.

Uses jax.profiler with a perfetto trace, then aggregates the trace JSON —
no TensorBoard needed.
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vfdepth_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from vfdepth_tpu.presets import ddad_bench_config  # noqa: E402
from vfdepth_tpu.data.fake import FakeDataset  # noqa: E402
from vfdepth_tpu.training.model import VFDepthModel  # noqa: E402
from vfdepth_tpu.training.step import create_train_state, build_train_step  # noqa: E402


def main():
    logdir = "/tmp/vfdepth_profile"
    os.system(f"rm -rf {logdir}")

    cfg = ddad_bench_config(batch_size=1, mixed_precision=True)
    model = VFDepthModel(cfg)
    ds = FakeDataset(num_samples=1, num_cams=6, height=384, width=640,
                     fusion_level=2)
    batch = {k: jnp.asarray(v) for k, v in ds.batch([0]).items()}
    rng = jax.random.PRNGKey(0)
    state, tx = create_train_state(model, rng, batch, steps_per_epoch=1000)
    step = build_train_step(model, tx)
    state, logs = step(state, batch, rng)
    jax.block_until_ready(logs["total_loss"])
    print("compiled; tracing...", flush=True)

    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    for _ in range(3):
        state, logs = step(state, batch, rng)
    jax.block_until_ready(logs["total_loss"])
    jax.profiler.stop_trace()

    traces = glob.glob(f"{logdir}/**/*.json.gz", recursive=True)
    print("trace files:", traces, flush=True)
    if not traces:
        print("no perfetto trace emitted", flush=True)
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", data if isinstance(data, list) else [])
    durs = defaultdict(float)
    full = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        # keep device op events (heuristic: XLA op names)
        durs[name.split(".")[0][:60]] += dur
        # un-merged individual op instances, with any long_name metadata
        args = e.get("args") or {}
        ln = args.get("long_name") or args.get("hlo_op") or ""
        full[(name[:80], str(ln)[:140])] += dur
        total += dur
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:40]
    print(f"total traced op time {total:.0f} ms (3 steps)", flush=True)
    for name, ms in top:
        print(f"{ms:9.1f} ms  {name}", flush=True)
    print("\n--- top individual ops ---", flush=True)
    for (name, ln), ms in sorted(full.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{ms:9.1f} ms  {name}  | {ln}", flush=True)


if __name__ == "__main__":
    main()
