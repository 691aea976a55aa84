"""Perfetto-trace aggregation: per-op device-time table + category rollup.

The reference has no profiling story at all (SURVEY.md §5); on TPU the
ground truth for "where does the step go" is the XLA op timeline inside a
``jax.profiler`` perfetto trace. This module turns that trace into:

  * a leaf-op table (device time, op name, HLO snippet), and
  * a category rollup (XLA's own ``hlo_category`` refined with model-aware
    buckets: the Pallas samplers/warps, gather/scatter, layout copies) plus
    an MFU estimate,

which is what ``python bench.py --profile`` prints and appends to
docs/PERF.md. Only events on the device's "XLA Ops" thread are summed —
scope rows (jit_*, step numbers, python frames) live on other threads, so
categories add up to the step time instead of double-counting.
"""
from __future__ import annotations

import glob
import gzip
import json
import re
from collections import defaultdict
from typing import Dict, Tuple


def load_trace_events(logdir: str) -> list:
    """Read the newest perfetto trace under ``logdir``."""
    traces = sorted(glob.glob(f"{logdir}/**/*.json.gz", recursive=True))
    traces = [t for t in traces if "perfetto" in t] or traces
    if not traces:
        return []
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", data if isinstance(data, list) else [])


def _xla_op_tracks(events: list) -> set:
    """(pid, tid) pairs of device-side 'XLA Ops' threads."""
    device_pids = set()
    tracks = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "/device:" in str(e.get("args", {}).get("name", "")):
                device_pids.add(e.get("pid"))
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("pid") in device_pids
                and e.get("args", {}).get("name") == "XLA Ops"):
            tracks.add((e.get("pid"), e.get("tid")))
    return tracks


def leaf_op_times(events: list) -> Dict[Tuple[str, str, str], float]:
    """{(name, hlo_category, hlo_snippet): device ms} over 'XLA Ops' rows."""
    tracks = _xla_op_tracks(events)
    out: Dict[Tuple[str, str, str], float] = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in tracks:
            continue
        args = e.get("args") or {}
        out[(e.get("name", ""), str(args.get("hlo_category", "")),
             str(args.get("long_name", ""))[:160])] += e.get("dur", 0) / 1e3
    return out


def _bucket(name: str, hlo_category: str, hlo: str) -> str:
    """Refine XLA's hlo_category with model-aware buckets."""
    text = f"{name} {hlo}"
    if "backproject" in text:
        return "pallas 2d-sampler"
    if re.search(r"jvp|warp", name) and "custom-call" in hlo:
        return "pallas warp"
    if "custom-call" in hlo:
        return "custom-call other"
    if re.search(r"gather|scatter", f"{hlo_category} {hlo}"):
        return "gather/scatter"
    if "convolution" in hlo_category:
        return "convolution"
    if re.search(r"copy|transpose|reshape|all-reduce", hlo_category):
        return "layout/copy"
    return hlo_category or "uncategorized"


def summarize(logdir: str, n_steps: int, flops_per_step: float | None = None,
              peak_flops: float = 197e12, top_k: int = 30) -> str:
    """Human-readable per-step profile table (all times divided by n_steps)."""
    events = load_trace_events(logdir)
    per_op = leaf_op_times(events)
    if not per_op:
        return "no device ops found in trace"
    cats: Dict[str, float] = defaultdict(float)
    for (name, hcat, hlo), ms in per_op.items():
        cats[_bucket(name, hcat, hlo)] += ms
    total = sum(cats.values()) / n_steps
    lines = [f"traced device-op time: {total:.1f} ms/step "
             f"({len(per_op)} distinct ops, {n_steps} steps)"]
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        lines.append(f"  {ms / n_steps:8.1f} ms/step  {cat}")
    if flops_per_step:
        mfu = flops_per_step / max(total / 1e3, 1e-9) / peak_flops
        lines.append(f"  MFU estimate: {100 * mfu:.1f}% of bf16 peak "
                     f"({flops_per_step / 1e12:.2f} TFLOP/step over "
                     f"{total:.0f} ms)")
    lines.append("top ops (ms/step):")
    for (name, hcat, hlo), ms in sorted(per_op.items(),
                                        key=lambda kv: -kv[1])[:top_k]:
        lines.append(f"  {ms / n_steps:8.1f}  [{_bucket(name, hcat, hlo)[:18]:18s}] "
                     f"{name[:40]:40s} {hlo[:80]}")
    return "\n".join(lines)
