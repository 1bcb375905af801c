#!/usr/bin/env python
"""Training-curve plots from metrics jsonl — the reference's save.sh
(lmj-plot over grepped glog lines, /root/reference/scripts/save.sh:44-59)
rebuilt over structured records.

Produces the same six panels: episode reward, evaluation reward, evaluation
steps, goal percentage, critic loss, actor avg-Q.

Usage: python scripts/plot.py RUN_metrics.jsonl [-o out.png]
"""

import argparse
import json


def load(path):
    recs = [json.loads(l) for l in open(path)]
    by = {}
    for r in recs:
        by.setdefault(r.get("kind"), []).append(r)
    return by


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics", help="*_metrics.jsonl file")
    ap.add_argument("-o", "--out", default="")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    by = load(args.metrics)
    fig, axes = plt.subplots(2, 3, figsize=(15, 8))
    panels = [
        ("episode", "episode", "reward", "Episode reward"),
        ("eval", "actor_iter", "avg_reward", "Eval avg reward"),
        ("eval", "actor_iter", "avg_steps", "Eval avg steps"),
        ("eval", "actor_iter", "goal_perc", "Goal %"),
        ("critic", "iter", "loss", "Critic loss"),
        ("actor", "iter", "avg_q", "Actor avg Q"),
    ]
    for ax, (kind, xk, yk, title) in zip(axes.ravel(), panels):
        rows = by.get(kind, [])
        xs = [r[xk] for r in rows if yk in r]
        ys = [r[yk] for r in rows if yk in r]
        ax.plot(xs, ys, lw=1)
        ax.set_title(title)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    out = args.out or args.metrics.replace("_metrics.jsonl", "_plots.png")
    fig.savefig(out, dpi=110)
    print(out)


if __name__ == "__main__":
    main()
