"""Summarize device-op time from a jax.profiler trace directory.

Usage: python tools/trace_top_ops.py /tmp/fit_trace [top_n]

Parses the perfetto trace.json.gz that jax.profiler.trace writes, sums
durations of events on the device-op ("XLA Ops") tracks grouped by op name,
and prints the top N with their share of total device time.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def load_trace(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        return json.load(f)


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fit_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    data = load_trace(trace_dir)
    events = data.get("traceEvents", [])

    # map (pid, tid) -> thread name to find the XLA-op tracks
    tnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]

    op_us = defaultdict(float)
    op_count = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        tname = tnames.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" not in tname and "Steps" not in tname and "TensorFlow Ops" not in tname:
            if "XLA" not in tname:
                continue
        if "Ops" not in tname:
            continue
        op_us[e["name"]] += e["dur"]
        op_count[e["name"]] += 1

    total = sum(op_us.values())
    if not total:
        raise SystemExit("no device-op events found (tracks: %s)" % sorted(set(tnames.values())))
    print(f"total device-op time: {total / 1e3:.2f} ms across all traced iterations")
    print(f"{'ms':>9} {'%':>6} {'n':>5}  op")
    for name, us in sorted(op_us.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{us / 1e3:9.3f} {us / total * 100:6.2f} {op_count[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
