#!/bin/bash
# Round-5 adaptive-exploration hard-rung table: explore 20k with
# stagnation-triggered anneal restarts (runtime/loop.py
# _maybe_restart_anneal) — the candidate ONE-recipe answer to the
# agent2d rung's seed bimodality: static explore 20k leaves seeds 2/7
# plateaued (r4: 0.49/0.66), static explore 40k fixes those but delays
# seed 4 (r5: 0.94 -> 0.58 at 3M).  The restart rule gives extra
# exploration only to seeds that demonstrate the plateau.
set -e
cd "$(dirname "$0")/.."
python scripts/exps.py --save_root runs/r5_agent2d_adaptive \
  --grid "seed=1,2,3,4,5,6,7" \
  --base "--envs 128 --evaluate_freq 51200 --snapshot_freq 2000000 \
          --no-snapshot_memory --defense_npcs 1 --action_space mid_level \
          --max_iter 2000000 --explore 20000 \
          --explore_adaptive_threshold 0.7 --explore_adaptive_stale 5 \
          --explore_adaptive_max_restarts 3"
