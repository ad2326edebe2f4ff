#!/usr/bin/env python3
"""Summarize device time per op from a jax.profiler trace.

Usage: python benchmarks/parse_trace.py <logdir> [top_n]
Finds the newest *.trace.json.gz under <logdir>, groups TensorCore events by
op name, prints total device ms (divide by the number of traced steps).
"""

import collections
import glob
import gzip
import json
import os
import sys


def main():
    logdir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        sys.exit(f"no trace under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Device lanes: pid whose name mentions TPU/TensorCore; fall back to all
    # complete events with dur.
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "Tensor" in n or "/device" in n.lower()}
    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        per_op[name] += e["dur"] / 1e3  # us -> ms
        total += e["dur"] / 1e3
    print(f"file={paths[-1]}")
    print(f"total device ms (all traced steps): {total:.2f}")
    for name, ms in per_op.most_common(top_n):
        print(f"{ms:10.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
