#!/usr/bin/env python
"""Experiment launcher / monitor — the reference's scripts/train.sh role
(condor job launch + regex monitor + historical sweep log,
/root/reference/scripts/train.sh:5-18,378-407) rebuilt as a resumable
sequential sweep runner.

The TPU grant is single-tenant, so runs execute one at a time (use
--parallel N only on the CPU backend). Each grid point gets its own save
prefix under --save_root; a manifest.jsonl records config, status, and the
best evaluation (the HiScore goal_perc the reference selected models by).
Re-running the same sweep skips grid points already marked done — the same
restart-and-resume contract the trainer itself has.

Examples:
  # lr sweep over a fixed replay memory (the reference's offline sweep,
  # train.sh:378-407)
  python scripts/exps.py --save_root runs/lr_sweep \
      --grid "critic_lr=1e-2,1e-3,1e-4" \
      --base "--learn_offline --memory_snapshot runs/1v0_replay.npz \
              --max_iter 50000"

  # beta ablation on 1v0 (train.sh beta sweeps)
  python scripts/exps.py --save_root runs/beta_sweep \
      --grid "beta=0.0,0.2,0.5,0.8,1.0" \
      --base "--envs 128 --max_iter 200000 --evaluate_freq 25600"
"""

import argparse
import itertools
import json
import os
import shlex
import subprocess
import sys
import time


def parse_grid(spec: str):
    """'a=1,2;b=x,y' -> [{'a':'1','b':'x'}, {'a':'1','b':'y'}, ...]"""
    axes = []
    for part in filter(None, (p.strip() for p in spec.split(";"))):
        name, _, vals = part.partition("=")
        axes.append([(name.strip(), v.strip())
                     for v in vals.split(",") if v.strip()])
    return [dict(combo) for combo in itertools.product(*axes)] if axes else [{}]


def run_name(point: dict) -> str:
    return "_".join(f"{k}{v}" for k, v in sorted(point.items())) or "base"


def summarize(metrics_path: str) -> dict:
    """Best evaluation + final train stats from a run's metrics jsonl."""
    best, last_eval, n_eval, last_iter = None, None, 0, 0
    if not os.path.exists(metrics_path):
        return {}
    for line in open(metrics_path):
        try:
            r = json.loads(line)
        except ValueError:
            continue
        if r.get("kind") == "eval":
            n_eval += 1
            last_eval = r
            if best is None or r.get("goal_perc", 0) > best.get("goal_perc", 0):
                best = r
        elif r.get("kind") in ("actor", "critic"):
            last_iter = max(last_iter, r.get("iter", 0))
    out = {"n_evals": n_eval, "last_iter": last_iter}
    if best:
        out["best_goal_perc"] = best["goal_perc"]
        out["best_actor_iter"] = best["actor_iter"]
    if last_eval:
        out["final_goal_perc"] = last_eval["goal_perc"]
    return out


def run_with_watchdog(cmd, save: str, stall_timeout: float) -> int:
    """Run one job; kill it (rc -9) if its metrics/log files stop advancing
    for stall_timeout seconds — the failure mode is a wedged device claim
    that sleeps forever with no progress.  A killed job stays un-done in the
    manifest, so the next sweep pass retries it (auto-resuming from its own
    snapshots)."""
    log_path = save + "_train.log"
    metrics_path = save + "_metrics.jsonl"

    def progress():
        t = 0.0
        for p in (log_path, metrics_path):
            try:
                t = max(t, os.path.getmtime(p))
            except OSError:
                pass
        return t

    with open(log_path, "w") as log:
        proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT)
        last = time.time()
        last_mtime = 0.0
        while True:
            rc = proc.poll()
            if rc is not None:
                return rc
            m = progress()
            if m > last_mtime:
                last_mtime, last = m, time.time()
            elif time.time() - last > stall_timeout:
                print(f"[stall] no progress for {stall_timeout:.0f}s; "
                      f"killing pid {proc.pid}", flush=True)
                proc.kill()
                proc.wait()
                return -9
            time.sleep(10)


def load_manifest(path: str) -> dict:
    done = {}
    if os.path.exists(path):
        for line in open(path):
            try:
                r = json.loads(line)
            except ValueError:
                continue
            if r.get("status") == "done":
                done[r["name"]] = r
    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save_root", required=True)
    ap.add_argument("--grid", default="",
                    help="flag grid: 'critic_lr=1e-3,1e-4;beta=0.2,0.5'")
    ap.add_argument("--base", default="",
                    help="flags passed to every run (quoted string)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="seeds per grid point (seed = 1..repeat)")
    ap.add_argument("--dry_run", action="store_true")
    ap.add_argument("--stall_timeout", type=float, default=900.0,
                    help="kill a run whose log/metrics stop advancing for "
                         "this many seconds (wedged device claim)")
    ap.add_argument("--settle", type=float, default=15.0,
                    help="seconds to wait before each run so the previous "
                         "TPU claim fully releases")
    args = ap.parse_args()

    os.makedirs(args.save_root, exist_ok=True)
    manifest_path = os.path.join(args.save_root, "manifest.jsonl")
    done = load_manifest(manifest_path)

    points = parse_grid(args.grid)
    jobs = []
    for point in points:
        for seed in range(1, args.repeat + 1):
            p = dict(point)
            if args.repeat > 1:
                p["seed"] = str(seed)
            jobs.append(p)

    print(f"{len(jobs)} runs ({len(done)} already done) -> {args.save_root}")
    for point in jobs:
        name = run_name(point)
        if name in done:
            print(f"[skip] {name} (done)")
            continue
        save = os.path.join(args.save_root, name)
        cmd = ([sys.executable, "-m", "dqn_hfo_tpu.cli", "--save", save]
               + shlex.split(args.base)
               + [f"--{k}={v}" for k, v in point.items()])
        print(f"[run ] {name}: {' '.join(cmd)}")
        if args.dry_run:
            continue
        # Let the previous run's device claim fully release — claiming the
        # single-tenant TPU while the prior process is still tearing down
        # can queue forever (.claude/skills/verify: single-tenant gotcha).
        time.sleep(args.settle)
        t0 = time.time()
        rc = run_with_watchdog(cmd, save, args.stall_timeout)
        rec = {
            "name": name, "point": point, "cmd": " ".join(cmd),
            "status": "done" if rc == 0 else f"failed({rc})",
            "wall_s": round(time.time() - t0, 1),
            **summarize(save + "_metrics.jsonl"),
        }
        with open(manifest_path, "a") as mf:
            mf.write(json.dumps(rec) + "\n")
        print(f"[{rec['status']}] {name}: "
              f"best_goal_perc={rec.get('best_goal_perc')} "
              f"({rec['wall_s']}s)")


if __name__ == "__main__":
    main()
