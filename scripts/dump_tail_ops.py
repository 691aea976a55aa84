"""Dump the long-tail op lists (data formatting / loop fusion / layout) from
a bench --profile perfetto trace, aggregated by HLO shape signature.

The category rollup in ``utils/trace_analysis.summarize`` shows ~100 ms/step
of 'loop fusion' + 'data formatting' with no single op above ~5 ms; this
script groups those hundreds of small ops by their output shape + category so
recurring patterns (e.g. one permute shape instantiated 48x) become visible.

Usage: python scripts/dump_tail_ops.py <trace_logdir> <n_steps>
"""
import re
import sys
from collections import defaultdict

sys.path.insert(0, ".")
from vfdepth_tpu.utils.trace_analysis import (  # noqa: E402
    leaf_op_times, load_trace_events, _bucket)

CATS = {"data formatting", "loop fusion", "layout/copy",
        "dynamic-update-slice", "while", "slice", "broadcast", "pad"}


def main(logdir, n_steps):
    per_op = leaf_op_times(load_trace_events(logdir))
    groups = defaultdict(lambda: [0.0, 0])
    for (name, hcat, hlo), ms in per_op.items():
        cat = _bucket(name, hcat, hlo)
        if cat not in CATS:
            continue
        # output shape signature: handles plain 'f32[1,2]{...}' and tuple
        # '(f32[..]{..}, s32[..]{..})' outputs; layout braces stripped.
        # Truncated long_names (the trace clips at ~160 chars) fall back to
        # the op name with the leading '%name = ' dropped.
        m = re.search(r"= (\(?[a-z0-9\[\],{}:()TSE]+?)(?: [a-z%].*)?$", hlo)
        shape = (re.sub(r"\{[^}]*\}", "", m.group(1)) if m
                 else re.sub(r"^%\S+ = ", "", hlo)[:40])
        shape = shape.split("{")[0]  # truncation mid-layout leaves one open
        g = groups[(cat, shape)]
        g[0] += ms
        g[1] += 1
    rows = sorted(groups.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for v in groups.values()) / n_steps
    print(f"tail categories total: {total:.1f} ms/step")
    for (cat, shape), (ms, cnt) in rows[:60]:
        print(f"  {ms / n_steps:7.2f} ms/step  x{cnt:3d}  [{cat:18s}] {shape}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__.strip().splitlines()[-1], file=sys.stderr)
        sys.exit(1)
    try:
        steps = int(sys.argv[2])
    except ValueError:
        print(f"n_steps must be an integer, got {sys.argv[2]!r}",
              file=sys.stderr)
        sys.exit(1)
    if steps <= 0:
        print("n_steps must be >= 1", file=sys.stderr)
        sys.exit(1)
    main(sys.argv[1], steps)
