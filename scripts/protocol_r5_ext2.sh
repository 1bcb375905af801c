#!/bin/bash
# Extend the sub-0.80 seeds of the round-5 adaptive hard-rung table from
# 2M to 3M iters — the same ONE recipe, run longer, still about half the
# reference's 5.92M-iteration budget for its recorded 0.80 HiScore
# (train.sh:79-80).  Auto-resume from each seed's 2M snapshot (the
# reference's restart-and-resume contract, dqn_main.cpp:214-220).
#
# Semantics note: the adaptive-restart counters are process-local (like
# the reference's iteration-derived epsilon schedule) — a resumed
# process starts a fresh stagnation window over the same
# --explore_adaptive_max_restarts budget.
set -e
cd "$(dirname "$0")/.."
SEEDS="${1:?usage: protocol_r5_ext2.sh 'seed list'}"
for s in $SEEDS; do
  python scripts/exps.py --save_root runs/r5_agent2d_adaptive_ext \
    --grid "seed=$s" \
    --base "--envs 128 --evaluate_freq 51200 --snapshot_freq 3000000 \
            --no-snapshot_memory --defense_npcs 1 --action_space mid_level \
            --max_iter 3000000 --explore 20000 \
            --explore_adaptive_threshold 0.7 --explore_adaptive_stale 5 \
            --explore_adaptive_max_restarts 3 \
            --resume runs/r5_agent2d_adaptive/seed$s" || true
done
