"""Summarize a jax.profiler perfetto trace: device time by op class.

Pairs with tools/profile_step.py:

    python tools/profile_step.py --steps 10 --outdir logs/trace
    python tools/analyze_trace.py logs/trace

Prints per-op-class device time (matmul / elementwise-fusion / reduce /
gather / sort / copy / rng) and the top individual fusions — the breakdown
that identified the HBM-bound elementwise tail in round 1
(docs/PERF_NOTES.md).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def classify(name: str) -> str:
    if "convolution" in name or "dot" in name:
        return "matmul"
    if "sort" in name:
        return "sort"
    if "gather" in name or "scatter" in name:
        return "gather/scatter"
    if "cumulative" in name or "scan" in name or "while" in name:
        return "scan/cumsum"
    if "reduce" in name:
        return "reduce-fusion"
    if "copy" in name or "transpose" in name or "bitcast" in name:
        return "copy/layout"
    if "rng" in name or "random" in name or "threefry" in name or "iota" in name:
        return "rng"
    if "fusion" in name:
        return "elementwise-fusion"
    return "other"


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("trace_dir", help="profiler output dir (or .trace.json.gz)")
    p.add_argument("--steps", type=int, default=None,
                   help="divide totals by this many steps")
    p.add_argument("--top", type=int, default=15)
    args = p.parse_args()

    path = args.trace_dir
    if os.path.isdir(path):
        cands = sorted(
            glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                      recursive=True)
        )
        if not cands:
            print(f"no *.trace.json.gz under {path}", file=sys.stderr)
            return 1
        path = cands[-1]

    with gzip.open(path) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n}

    ops = [
        e
        for e in events
        if e.get("ph") == "X"
        and (not dev_pids or e.get("pid") in dev_pids)
        and not re.fullmatch(r"\d+", e.get("name", ""))
        and not e["name"].startswith("jit_")
    ]
    total = sum(e.get("dur", 0) for e in ops)
    div = (args.steps or 1) * 1e3  # us -> ms, per step if given
    unit = "ms/step" if args.steps else "ms total"

    agg = collections.Counter()
    cnt = collections.Counter()
    per = collections.Counter()
    for e in ops:
        c = classify(e["name"])
        agg[c] += e.get("dur", 0)
        cnt[c] += 1
        per[e["name"]] += e.get("dur", 0)

    print(f"device op total: {total/div:.2f} {unit} ({len(per)} op names)")
    for c, d in agg.most_common():
        print(f"{d/div:9.3f} {unit}  {d/max(total,1)*100:5.1f}%  {c}  "
              f"({cnt[c]} events)")
    print("\ntop ops:")
    for n, d in per.most_common(args.top):
        print(f"{d/div:9.3f} {unit}  {n[:84]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
