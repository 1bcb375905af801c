#!/usr/bin/env python
"""Fast-mode comparison figure: goal%% vs gradient-sample budget and vs
wall-clock, parity batch-32 against the learning-validated fast modes.

Series (colors are the first three slots of the validated categorical
palette, fixed order — see the dataviz palette reference; the 3-slot
subset passes all-pairs CVD and normal-vision floors in light mode):
  1 parity batch 32          (#2a78d6)
  2 fast batch 256, matched  (#eb6834)
  3 fast batch 1024, 4x      (#1baf7a)

Usage: python scripts/plot_fastmode.py -o results/curves_r4_fastmode.png
"""

import argparse
import glob
import json
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e5e4e0"

SERIES = [
    ("parity batch 32", "#2a78d6", "runs/r4_1v0/seed*_metrics.jsonl", 32),
    ("fast batch 256 (matched budget)", "#eb6834",
     "runs/r4_fast_b/b256_match/*_metrics.jsonl", 256),
    ("fast batch 1024 (4x budget)", "#1baf7a",
     "runs/r4_fast_b/b1024_x4/*_metrics.jsonl", 1024),
]


def load(pattern, batch):
    """Per-seed (samples_M, wall_s, goal) eval trajectories."""
    out = []
    for f in sorted(glob.glob(pattern)):
        ev = [json.loads(l) for l in open(f)]
        ev = [r for r in ev if r.get("kind") == "eval"]
        if not ev:
            continue
        out.append((
            np.asarray([r["actor_iter"] * batch / 1e6 for r in ev]),
            np.asarray([r["t"] for r in ev]),
            np.asarray([r["goal_perc"] for r in ev]),
        ))
    return out


def panel(ax, xi, xlabel):
    for name, color, pattern, batch in SERIES:
        runs = load(pattern, batch)
        if not runs:
            continue
        # per-seed traces, thin; first seed carries the label
        for j, tr in enumerate(runs):
            ax.plot(tr[xi], tr[2], color=color, lw=2, alpha=1.0 if j == 0
                    else 0.45, label=name if j == 0 else None,
                    solid_capstyle="round")
        # direct label at the last point of the first seed (right panel
        # only — the left panel's endpoints collide; the legend carries
        # identity there)
        if xi == 1:
            tr = runs[0]
            ax.annotate(name.split(" (")[0], (tr[xi][-1], tr[2][-1]),
                        textcoords="offset points", xytext=(4, 4),
                        fontsize=8, color=TEXT2)
    ax.set_xlabel(xlabel, color=TEXT2, fontsize=9)
    ax.set_ylabel("evaluation goal %", color=TEXT2, fontsize=9)
    ax.set_ylim(-0.02, 1.05)
    ax.grid(color=GRID, lw=0.6)
    ax.set_facecolor(SURFACE)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=TEXT2, labelsize=8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="results/curves_r4_fastmode.png")
    args = ap.parse_args()

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.2), facecolor=SURFACE)
    panel(axes[0], 0, "gradient samples (millions; parity budget = 32M)")
    panel(axes[1], 1, "wall-clock seconds (single TPU chip)")
    axes[0].legend(loc="upper left", fontsize=8, frameon=False,
                   labelcolor=TEXT)
    fig.suptitle("1v0: parity batch-32 vs learning-validated fast modes",
                 color=TEXT, fontsize=11)
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=130)
    print(args.out)


if __name__ == "__main__":
    main()
