#!/bin/bash
# Round-5 continuation queue 2 (chained after protocol_r5_queue.sh):
# VERDICT weak #1 tail — the three adaptive-recipe seeds below 0.80
# (2/4/7: 0.75/0.79/0.74 at 3M, all still rising) re-run fresh to 4M
# under the IDENTICAL adaptive recipe (seeded streams are deterministic,
# so the first 2M reproduces the committed table; the question the runs
# settle is whether the rising tail crosses the reference's 0.80 within
# 4M — still 2/3 of its recorded 5.92M budget).
set -e
cd "$(dirname "$0")/.."
python scripts/exps.py --save_root runs/r5_agent2d_adaptive_4m \
  --grid "seed=2,4,7" \
  --base "--envs 128 --evaluate_freq 51200 --snapshot_freq 2000000 \
          --no-snapshot_memory --defense_npcs 1 --action_space mid_level \
          --max_iter 4000000 --explore 20000 \
          --explore_adaptive_threshold 0.7 --explore_adaptive_stale 5 \
          --explore_adaptive_max_restarts 3"
echo "R5 QUEUE2 COMPLETE"
