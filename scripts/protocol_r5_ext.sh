#!/bin/bash
# Round-5 hard-rung extension: the explore-40k recipe shifts the whole
# learning takeoff later (every seed's curve is still rising at 2M), so
# the one-recipe table runs to 3M iters — still HALF the reference's
# 5.92M-iteration budget for its 0.80 HiScore (train.sh:79-80).  Each
# seed auto-resumes from its 2M snapshot (same save prefix, same
# command, higher --max_iter: the reference's restart-and-resume
# contract, dqn_main.cpp:214-220).
set -e
cd "$(dirname "$0")/.."
for s in 1 2 3 4 5 6 7; do
  python scripts/exps.py --save_root runs/r5_1v1_agent2d_e40k_ext \
    --grid "seed=$s" \
    --base "--envs 128 --evaluate_freq 51200 --snapshot_freq 3000000 \
            --no-snapshot_memory --defense_npcs 1 --action_space mid_level \
            --max_iter 3000000 --explore 40000 \
            --resume runs/r5_1v1_agent2d_e40k/seed$s" || true
done
