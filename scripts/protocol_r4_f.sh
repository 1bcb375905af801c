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

# Extend the r4 2v2 sharing run to 1.2M iters (auto-resume from its
# 600k snapshot) to match the r3 ablation horizon on the r4 encoder.
python scripts/exps.py --save_root runs/r4_2v2_share_ext \
  --base "--envs 64 --evaluate_freq 25600 --snapshot_freq 1000000 \
          --no-snapshot_memory --defense_chasers 1 --defense_npcs 1 \
          --action_space mid_level --max_iter 1200000 --explore 20000 \
          --offense_agents 2 --share_actor_layers 4 --share_critic_layers 4 \
          --share_replay_memory --resume runs/r4_2v2_share/base"
