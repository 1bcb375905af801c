#!/bin/bash
# Stage G (final round-4 batch):
# 1) batch-4096 at 4x samples = 31,250 steps — the step-count theory
#    predicts failure (same step count as the failing b1024-matched
#    stage-A points despite 16x their samples); a falsifiable check.
# 2) agent2d plateau probe: seed 2 (plateaus ~0.5 under both encoders)
#    with doubled exploration.
# 3) 2v2 no-share arm on the r4 encoder (completes the r4 ablation).
# 4) 2v1 passing curriculum re-anchor on the r4 encoder, 2 seeds.
set -e
cd "$(dirname "$0")/.."
python scripts/exps.py --save_root runs/r4_fast_b/b4096_x4 \
  --base "--envs 128 --snapshot_freq 10000000 --no-snapshot_memory --seed 1 \
          --minibatch 4096 --update_ratio 0.003125 --max_iter 31250 \
          --explore 313 --evaluate_freq 800 --loss_display_iter 32"
python scripts/exps.py --save_root runs/r4_agent2d_probe \
  --base "--envs 128 --evaluate_freq 51200 --snapshot_freq 2000000 \
          --no-snapshot_memory --defense_npcs 1 --action_space mid_level \
          --max_iter 2000000 --explore 40000 --seed 2"
python scripts/exps.py --save_root runs/r4_2v2_noshare \
  --base "--envs 64 --evaluate_freq 25600 --snapshot_freq 1000000 \
          --no-snapshot_memory --defense_chasers 1 --defense_npcs 1 \
          --action_space mid_level --max_iter 1200000 --explore 20000 \
          --offense_agents 2"
python scripts/exps.py --save_root runs/r4_2v1 --repeat 2 \
  --base "--envs 128 --evaluate_freq 25600 --snapshot_freq 1000000 \
          --no-snapshot_memory --offense_npcs 1 --defense_chasers 1 \
          --action_space mid_level --max_iter 600000 --explore 20000"
