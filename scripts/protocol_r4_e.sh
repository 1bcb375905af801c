#!/bin/bash
# Stage E: re-anchor the hard rung (1v1 vs the agent2d stand-in keeper)
# on the round-4 encoder (published HFO feature layout) — 7 seeds, same
# config as runs/r3_1v1_agent2d.  The learning problem is encoder-
# permutation-equivalent, but the shipped claim should be backed by runs
# on the shipped encoder.
set -e
cd "$(dirname "$0")/.."
python scripts/exps.py --save_root runs/r4_1v1_agent2d --grid "seed=1,2,3,4,5,6,7" \
  --base "--envs 128 --evaluate_freq 51200 --snapshot_freq 2000000 \
          --no-snapshot_memory --defense_npcs 1 --action_space mid_level \
          --max_iter 2000000 --explore 20000"
