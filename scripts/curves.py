#!/usr/bin/env python
"""Multi-seed learning-curve aggregation — mean +/- std of eval metrics
across seeds, the comparison protocol the reference ran by eyeballing
lmj-plot overlays of its regression jobs (train.sh:245-258).

Groups are labeled directories or explicit file lists:

  python scripts/curves.py runs/r2_1v0 runs/r2_1v1 -o results/curves_r2.png
  python scripts/curves.py 1v0=runs/r2_1v0/seed*_metrics.jsonl -o out.png

Each group plots goal% (top) and eval avg reward (bottom) vs actor_iter:
per-seed traces faint, mean bold, +/- 1 std band.  Also prints a summary
table (per-seed best goal% and the iter it was reached).
"""

import argparse
import glob
import json
import os

import numpy as np


def eval_series(path):
    xs, gs, rs = [], [], []
    for line in open(path):
        try:
            r = json.loads(line)
        except ValueError:
            continue
        if r.get("kind") == "eval" and "agent" not in r:
            xs.append(r["actor_iter"])
            gs.append(r["goal_perc"])
            rs.append(r["avg_reward"])
    return np.asarray(xs), np.asarray(gs), np.asarray(rs)


def expand_group(spec):
    """'label=globpat' or a directory (label = basename, files =
    <dir>/*_metrics.jsonl) or a single metrics file."""
    if "=" in spec:
        label, pat = spec.split("=", 1)
        return label, sorted(glob.glob(pat))
    if os.path.isdir(spec):
        return os.path.basename(spec.rstrip("/")), sorted(
            glob.glob(os.path.join(spec, "*_metrics.jsonl")))
    return os.path.basename(spec).replace("_metrics.jsonl", ""), [spec]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("groups", nargs="+",
                    help="dir | label=glob | metrics.jsonl, one per group")
    ap.add_argument("-o", "--out", default="results/curves.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax_g, ax_r) = plt.subplots(2, 1, figsize=(10, 8), sharex=True)
    colors = plt.rcParams["axes.prop_cycle"].by_key()["color"]
    summary = []
    for gi, spec in enumerate(args.groups):
        label, files = expand_group(spec)
        if not files:
            print(f"[warn] no metrics files for group {label!r}")
            continue
        series = [eval_series(f) for f in files]
        series = [(x, g, r) for x, g, r in series if len(x)]
        color = colors[gi % len(colors)]
        for x, g, r in series:
            ax_g.plot(x, g, color=color, alpha=0.25, lw=0.8)
            ax_r.plot(x, r, color=color, alpha=0.25, lw=0.8)
        # mean/std on the common grid (interpolate each seed)
        grid = np.unique(np.concatenate([x for x, _, _ in series]))
        G = np.stack([np.interp(grid, x, g) for x, g, _ in series])
        R = np.stack([np.interp(grid, x, r) for x, _, r in series])
        ax_g.plot(grid, G.mean(0), color=color, lw=2,
                  label=f"{label} (n={len(series)})")
        ax_g.fill_between(grid, G.mean(0) - G.std(0), G.mean(0) + G.std(0),
                          color=color, alpha=0.15)
        ax_r.plot(grid, R.mean(0), color=color, lw=2)
        ax_r.fill_between(grid, R.mean(0) - R.std(0), R.mean(0) + R.std(0),
                          color=color, alpha=0.15)
        for f, (x, g, _) in zip(files, series):
            b = int(np.argmax(g))
            summary.append((label, os.path.basename(f), float(g[b]),
                            int(x[b])))
    ax_g.set_ylabel("goal %")
    ax_g.set_ylim(-0.02, 1.02)
    ax_g.legend(loc="lower right", fontsize=9)
    ax_g.grid(alpha=0.3)
    ax_r.set_ylabel("eval avg reward")
    ax_r.set_xlabel("actor iteration")
    ax_r.grid(alpha=0.3)
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=110)
    print(args.out)
    print(f"{'group':<16}{'run':<28}{'best goal%':>11}{'@iter':>10}")
    for label, run, best, it in summary:
        print(f"{label:<16}{run:<28}{best:>11.2f}{it:>10}")


if __name__ == "__main__":
    main()
