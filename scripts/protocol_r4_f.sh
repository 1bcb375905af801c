#!/bin/bash
# Stage F: 1v1-chaser fast mode with the ROBUST recipe (batch 1024 at 4x
# sample budget — 0.97/0.94/0.78 on 1v0), in case the batch-256
# matched-budget recipe shows its 1v0 seed fragility on 1v1 too.
set -e
cd "$(dirname "$0")/.."
python scripts/exps.py --save_root runs/r4_fast_1v1_x4 --repeat 3 \
  --base "--envs 128 --snapshot_freq 10000000 --no-snapshot_memory \
          --defense_chasers 1 --action_space mid_level \
          --minibatch 1024 --update_ratio 0.0125 --max_iter 125000 \
          --explore 2500 --evaluate_freq 3200 --loss_display_iter 125"
