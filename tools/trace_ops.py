# Copyright 2026. Apache License 2.0.
"""Offline trace analysis: top device ops from a jax.profiler trace dir.

    python tools/trace_ops.py /tmp/dispatch_trace_single [steps] [top]

Only events on the device "XLA Ops" track count (the name-keyed
aggregation in older probes mixed host rows into device totals).
Ops are grouped by a coarse category to show where the step time goes.
"""
import glob
import gzip
import json
import re
import sys


def categorize(name, hlo_category=""):
    # Prefer the profiler's hlo_category: flax scoping names Pallas
    # custom calls after their module ("Conv_0.N"), which a name-only
    # match misfiles as XLA convolutions.
    h = (hlo_category or "").lower()
    if h:
        if "custom" in h:
            return "pallas custom call"
        if "convolution" in h:
            return "xla convolution"
        if "all-reduce" in h or "all-gather" in h or "collective" in h:
            return "collective"
        if h in ("copy", "bitcast", "reshape", "transpose"):
            return "copy/layout"
        if "fusion" in h and ("input" in h or "loop" in h or
                              "output" in h or h == "fusion"):
            return "fusion (elementwise/reduce)"
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n:
        return "pallas custom call"
    if n.startswith("conv") or "convolution" in n:
        return "xla convolution"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "copy" in n or "bitcast" in n or "reshape" in n or "transpose" in n:
        return "copy/layout"
    if "fusion" in n:
        return "fusion (elementwise/reduce)"
    if "dynamic" in n or "slice" in n or "pad" in n or "concatenate" in n:
        return "slice/pad/concat"
    return "other"


def main():
    outdir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    traces = sorted(glob.glob(outdir + "/**/*.trace.json.gz",
                              recursive=True))
    if not traces:
        print("no trace found under", outdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pnames[e["pid"]] = e["args"].get("name", "?")
            elif e.get("name") == "thread_name":
                tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "?")
    dev_ops_tracks = {k for k, v in tnames.items()
                      if v == "XLA Ops" and "device" in pnames.get(
                          k[0], "")}
    totals, counts, cats = {}, {}, {}
    total = 0
    for e in events:
        if (e.get("ph") == "X" and "dur" in e and
                (e["pid"], e.get("tid")) in dev_ops_tracks):
            name = e.get("name", "?")
            totals[name] = totals.get(name, 0) + e["dur"]
            counts[name] = counts.get(name, 0) + 1
            c = categorize(name, e.get("args", {}).get(
                "hlo_category", ""))
            cats[c] = cats.get(c, 0) + e["dur"]
            total += e["dur"]
    print("device XLA-Ops busy total: {:.1f} ms = {:.1f} ms/step".format(
        total / 1e3, total / 1e3 / steps))
    print("\nby category (ms/step):")
    for c, d in sorted(cats.items(), key=lambda kv: -kv[1]):
        print("  {:>9.2f} ms  {:4.1f}%  {}".format(
            d / 1e3 / steps, 100 * d / total, c))
    print("\ntop {} ops (ms/step, count/step):".format(top))
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print("  {:>8.2f} ms  x{:<5.1f} {}".format(
            dur / 1e3 / steps, counts[name] / steps, name[:100]))


if __name__ == "__main__":
    main()
