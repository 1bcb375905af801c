#!/usr/bin/env python
"""Summarize a jax.profiler trace of one training superstep.

The loop's one-shot capture (runtime/loop.py, --profile_dir) records a
steady-state superstep; this tool aggregates the chrome-trace events into
the coarse phases that matter for the coupled-rate question (VERDICT r4
weak #3): rollout physics + NPC policy, actor forward, critic/actor
update matmuls, optimizer/elementwise, replay scatter/gather, infeed and
host gaps.  Replaces eyeballing TensorBoard, which this box cannot run.

Usage: python scripts/trace_summary.py runs/r5_2v2_profile/trace
Prints a per-bucket total-duration table for the busiest device track
and the top-20 individual ops.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

BUCKETS = [
    ("update-matmul", re.compile(r"dot|conv|matmul|gemm", re.I)),
    ("replay", re.compile(r"scatter|gather|dynamic-update|dynamic_update", re.I)),
    ("sort/topk", re.compile(r"sort|top-k|topk", re.I)),
    ("rng", re.compile(r"rng|threefry|random", re.I)),
    ("scan-loop", re.compile(r"while|scan|body", re.I)),
    ("collective", re.compile(r"all-reduce|all-gather|psum|collective|reduce-scatter", re.I)),
    ("copy/infeed", re.compile(r"copy|infeed|outfeed|transfer|convert", re.I)),
    ("elementwise/fusion", re.compile(r"fusion|add|mul|select|broadcast|reduce", re.I)),
]


def load_events(trace_dir):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True)
        + glob.glob(os.path.join(trace_dir, "**", "*.trace.json"),
                    recursive=True)
    )
    if not paths:
        raise SystemExit(f"no trace.json[.gz] under {trace_dir} "
                         f"(contents: {os.listdir(trace_dir)})")
    path = paths[-1]
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return path, data.get("traceEvents", [])


def main(trace_dir):
    path, events = load_events(trace_dir)
    # pid/tid -> display name from metadata events
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", str(e["pid"]))
    # complete events ("X") per pid
    per_track = collections.defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            per_track[e["pid"]].append(e)
    if not per_track:
        raise SystemExit("no duration events in trace")
    # busiest track = most total duration (usually the device compute track)
    scored = sorted(
        per_track.items(),
        key=lambda kv: -sum(ev["dur"] for ev in kv[1]),
    )
    print(f"trace: {path}")
    for pid, evs in scored[:4]:
        total = sum(e["dur"] for e in evs) / 1e3
        print(f"  track {names.get(pid, pid)!r}: {len(evs)} events, "
              f"{total:.1f} ms total")
    pid, evs = scored[0]
    print(f"\n== busiest track: {names.get(pid, pid)!r} ==")
    span = (max(e["ts"] + e["dur"] for e in evs)
            - min(e["ts"] for e in evs)) / 1e3
    busy = sum(e["dur"] for e in evs) / 1e3
    print(f"span {span:.1f} ms, busy {busy:.1f} ms, "
          f"idle/host-gap {span - busy:.1f} ms ({100*(span-busy)/max(span,1e-9):.0f}%)")

    bucket_tot = collections.Counter()
    op_tot = collections.Counter()
    for e in evs:
        nm = e.get("name", "?")
        op_tot[nm] += e["dur"]
        for b, rx in BUCKETS:
            if rx.search(nm):
                bucket_tot[b] += e["dur"]
                break
        else:
            bucket_tot["other"] += e["dur"]
    print("\nper-bucket busy time:")
    for b, d in bucket_tot.most_common():
        print(f"  {b:<22} {d/1e3:9.2f} ms  {100*d/max(sum(bucket_tot.values()),1):5.1f}%")
    print("\ntop-20 ops:")
    for nm, d in op_tot.most_common(20):
        print(f"  {d/1e3:9.2f} ms  {nm[:100]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/r5_2v2_profile/trace")
