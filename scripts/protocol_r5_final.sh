#!/bin/bash
# Round-5 final TPU stage:
#  1) seed 4 of the explore-40k hard-rung table extended to the
#     REFERENCE'S OWN budget (5.92M iters — its recorded 0.80 HiScore,
#     train.sh:79-80): the other six seeds clear 0.96 by 3M, seed 4 is
#     still rising at 0.58; the claim to settle is "at the reference's
#     budget every seed beats its 0.80".
#  2) fast-mode 2v2 rerun under the SERIALIZED share mode (the
#     19:43 runs predate the share_mode default flip and used batched,
#     which is learning-weaker — conflated read).
#  3) fast-mode 2v2 at a 4x step cut (300k iters, ur 0.025, 8x samples)
#     — the 8x cut (150k) lands at ~0.3 vs parity 0.5; test whether the
#     gentler cut recovers parity-class learning at the ~66k rate.
set -e
cd "$(dirname "$0")/.."

python scripts/exps.py --save_root runs/r5_agent2d_seed4_refbudget \
  --base "--envs 128 --evaluate_freq 51200 --snapshot_freq 6000000 \
          --no-snapshot_memory --defense_npcs 1 --action_space mid_level \
          --max_iter 5920000 --explore 40000 \
          --resume runs/r5_1v1_agent2d_e40k_ext/seed4 --seed 4"

MA2="--defense_chasers 1 --defense_npcs 1 --action_space mid_level \
     --offense_agents 2 --share_actor_layers 4 --share_critic_layers 4 \
     --share_replay_memory --no-snapshot_memory --snapshot_freq 10000000 \
     --envs 64 --minibatch 1024"

python scripts/exps.py --save_root runs/r5_fast2v2_serial --grid "seed=1,2" \
  --base "$MA2 --update_ratio 0.0125 --max_iter 150000 --explore 2500 \
          --evaluate_freq 3200 --loss_display_iter 125"

python scripts/exps.py --save_root runs/r5_fast2v2_300k --grid "seed=1,2" \
  --base "$MA2 --update_ratio 0.025 --max_iter 300000 --explore 5000 \
          --evaluate_freq 6400 --loss_display_iter 250"
