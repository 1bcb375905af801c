#!/bin/bash
# Round-5 stage: multi-agent fast mode + profile.
# The batched share mode did not move the 2v2 coupled rate (22.2k vs
# r4's 22.8k env-steps/s): the path is latency-bound in BOTH the 3200
# sequential batch-32 iterations per chunk and the 64-env rollout, not
# in the (removed) Python unroll.  The validated throughput lever for
# latency-bound coupled training is the fast mode (batch 1024 at 4x the
# sample budget = 8x fewer sequential steps, learning-validated on 1v0
# and 1v1, RESULTS.md).  Apply it to the 2v2 sharing rung:
#   parity: 1.2M iters, ur 0.1, b32  ->  fast: 150k iters, ur 0.0125,
#   b1024 (same env interactions, 4x samples, 8x fewer Adam steps).
# Also: one short profiled 2v2 run (--profile_dir) for the committed
# trace breakdown, and 128-env variants of both modes (the rollout is
# latency-bound, so envs are nearly free).
set -e
cd "$(dirname "$0")/.."
MA2="--defense_chasers 1 --defense_npcs 1 --action_space mid_level \
     --offense_agents 2 --share_actor_layers 4 --share_critic_layers 4 \
     --share_replay_memory --no-snapshot_memory --snapshot_freq 10000000"

python scripts/exps.py --save_root runs/r5_fast2v2 --grid "seed=1,2" \
  --base "$MA2 --envs 64 --minibatch 1024 --update_ratio 0.0125 \
          --max_iter 150000 --explore 2500 --evaluate_freq 3200 \
          --loss_display_iter 125"

# 128-env fast variant (rollout latency amortizes; update count per env
# step unchanged)
python scripts/exps.py --save_root runs/r5_fast2v2_e128 \
  --base "$MA2 --envs 128 --minibatch 1024 --update_ratio 0.0125 \
          --max_iter 150000 --explore 2500 --evaluate_freq 3200 \
          --loss_display_iter 125 --seed 1"

# short profiled parity run for the trace breakdown
python scripts/exps.py --save_root runs/r5_2v2_profile \
  --base "$MA2 --envs 64 --max_iter 60000 --explore 2000 \
          --evaluate_freq 1000000 --profile_dir runs/r5_2v2_profile/trace \
          --seed 1"
