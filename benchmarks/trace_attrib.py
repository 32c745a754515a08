#!/usr/bin/env python
"""Bucket a jax.profiler trace's device-op time by op kind and source line.

Usage:
    python benchmarks/step_bench.py --profile /tmp/trace ...
    python benchmarks/trace_attrib.py /tmp/trace [--top 25]

Reads the newest plugins/profile/*/ *.trace.json.gz under the given dir,
keeps complete events on TPU/device tids, and prints two tables:
  1. time by op-kind bucket (dot / conv / pallas / reduce+convert / copy ...)
  2. time by source location (args.source when the runtime records it).
Durations are summed over however many steps the trace holds and normalized
by the step count inferred from the top-level module events (falls back to
raw sums). This is the attribution method NOTES.md calls reliable —
microbench deltas over the tunnel are dominated by the ~0.5 ms fence floor.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(root: str) -> str:
    pats = sorted(
        glob.glob(os.path.join(root, "plugins", "profile", "*", "*.trace.json.gz"))
    )
    if not pats:
        pats = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                                recursive=True))
    if not pats:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    return pats[-1]


def bucket(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "pallas" in n:
        return "pallas/custom-call"
    if n.startswith("%dot") or "dot." in n or n.startswith("dot") or "gemm" in n:
        return "dot (matmul)"
    if "conv" in n and "convert" not in n:
        return "conv"
    if "convert" in n or "reduce" in n:
        return "convert/reduce (norm stats)"
    if "copy" in n or "transpose" in n or "bitcast" in n or "reshape" in n:
        return "copy/transpose"
    if "fusion" in n:
        return "fusion (elementwise)"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "dynamic" in n or "gather" in n or "scatter" in n or "slice" in n:
        return "gather/slice"
    return "other"


def attribute(trace_dir: str):
    """Parse the newest trace under ``trace_dir`` and return
    (by_bucket_ms, by_name_ms, by_source_ms, by_pair_ms, total_ms) — the
    same attribution main() prints, as dicts in milliseconds. NOTE: XLA
    control-flow ops ("while") are counted once as their own lane event AND
    once per body op, so scan-heavy traces double-count the scan total;
    subtract the "while" entry from by_name for wall-consistent sums.
    """
    path = find_trace(trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device pids: process names containing TPU/device; XLA op lanes have
    # thread names like "XLA Ops" / "Steps". Keep complete events with dur.
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    device_pids = {
        p for p, n in pid_names.items()
        if re.search(r"tpu|device|/device", n, re.I) and "host" not in n.lower()
    }
    if not device_pids:
        device_pids = set(pid_names)

    op_lanes = {
        key for key, n in tid_names.items()
        if key[0] in device_pids and re.search(r"xla op|tensorflow op|ops", n, re.I)
    }

    by_bucket = collections.Counter()
    by_name = collections.Counter()
    by_source = collections.Counter()
    by_pair = collections.Counter()
    by_category = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        key = (e.get("pid"), e.get("tid"))
        if op_lanes and key not in op_lanes:
            continue
        if not op_lanes and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = e["dur"]  # microseconds
        total += dur
        by_bucket[bucket(name)] += dur
        by_name[re.sub(r"\.\d+", "", name)] += dur
        a = e.get("args") or {}
        # hlo_category is XLA's OWN op classification (e.g. "convolution
        # fusion" = MXU work incl. dot-rooted fusions, "loop fusion" =
        # elementwise, "data formatting" = layout copies) — authoritative
        # where the name-regex buckets misfile generic "fusion" ops.
        by_category[a.get("hlo_category") or "<uncategorized>"] += dur
        src = a.get("source") or a.get("source_info") or ""
        if src:
            by_source[src] += dur
            by_pair[(re.sub(r"\.\d+", "", name), src)] += dur

    to_ms = lambda c: {k: v / 1e3 for k, v in c.items()}  # noqa: E731
    return (to_ms(by_bucket), to_ms(by_name), to_ms(by_source),
            {k: v / 1e3 for k, v in by_pair.items()}, total / 1e3,
            to_ms(by_category))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=0,
                    help="divide sums by this step count (0 = report raw)")
    args = ap.parse_args()

    print(f"# {find_trace(args.trace_dir)}", file=sys.stderr)
    (by_bucket, by_name, by_source, by_pair, total,
     by_category) = attribute(args.trace_dir)
    by_bucket = collections.Counter(by_bucket)
    by_name = collections.Counter(by_name)
    by_source = collections.Counter(by_source)
    by_pair = collections.Counter(by_pair)
    by_category = collections.Counter(by_category)

    div = args.steps if args.steps else 1
    unit = "ms/step" if args.steps else "ms total"
    print(f"device op time: {total/div:.2f} {unit}")
    print("\n== by XLA hlo_category ==")
    for k, v in by_category.most_common():
        print(f"{v/div:9.2f}  {100*v/total:5.1f}%  {k}")
    print("\n== by bucket ==")
    for k, v in by_bucket.most_common():
        print(f"{v/div:9.2f}  {100*v/total:5.1f}%  {k}")
    print(f"\n== top {args.top} op names ==")
    for k, v in by_name.most_common(args.top):
        print(f"{v/div:9.2f}  {100*v/total:5.1f}%  {k[:100]}")
    if by_source:
        print(f"\n== top {args.top} sources ==")
        for k, v in by_source.most_common(args.top):
            print(f"{v/div:9.2f}  {100*v/total:5.1f}%  {k[:120]}")
    if by_pair:
        print(f"\n== top {args.top} (op, source) pairs ==")
        for (nm, src), v in by_pair.most_common(args.top):
            print(f"{v/div:9.2f}  {100*v/total:5.1f}%  {nm[:40]:40s}  {src[-60:]}")


if __name__ == "__main__":
    main()
