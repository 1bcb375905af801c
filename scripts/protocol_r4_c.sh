#!/bin/bash
# Round-4 stage C:
#  1) re-anchor the 1v0 headline on the round-4 encoder (the feature
#     layout moved to HFO's published ordering; learning is encoder-
#     permutation-invariant, but the claim should be backed on the
#     shipped encoder) - 3 seeds;
#  2) 2v2 sharing run on the new encoder (also feeds 3);
#  3) 3v3 CURRICULUM: per-agent init from the 2v2 policy's agent-0
#     slice (VERDICT r3 #5 stretch) vs the cold 3v3 (r3: 0.03).
set -e
cd "$(dirname "$0")/.."
COMMON="--envs 128 --evaluate_freq 25600 --snapshot_freq 1000000 --no-snapshot_memory"

python scripts/exps.py --save_root runs/r4_1v0 --repeat 3 \
  --base "$COMMON --max_iter 1000000 --explore 10000"

MA="--envs 64 --evaluate_freq 25600 --snapshot_freq 1000000 --no-snapshot_memory \
    --defense_chasers 1 --defense_npcs 1 \
    --action_space mid_level --max_iter 600000 --explore 20000"
python scripts/exps.py --save_root runs/r4_2v2_share \
  --base "$MA --offense_agents 2 --share_actor_layers 4 --share_critic_layers 4 \
          --share_replay_memory"

# curriculum seed: agent-0 slice of the trained 2v2 actor+critic
ACTOR=$(ls runs/r4_2v2_share/base_actor_iter_*.npz 2>/dev/null | tail -1)
CRITIC=$(ls runs/r4_2v2_share/base_critic_iter_*.npz 2>/dev/null | tail -1)
if [ -n "$ACTOR" ]; then
  # 2v2 observer sees (1 teammate, 2 opponents); 3v3 sees (2, 3):
  # remap ip1 rows onto the wider input, zero rows for the new players
  python scripts/split_snapshot.py "$ACTOR" runs/r4_2v2_share/warm_actor \
      --remap 1,2,2,3
  python scripts/split_snapshot.py "$CRITIC" runs/r4_2v2_share/warm_critic \
      --remap 1,2,2,3
  AW=runs/r4_2v2_share/warm_actor_agent0.npz
  CW=runs/r4_2v2_share/warm_critic_agent0.npz
  python scripts/exps.py --save_root runs/r4_3v3_warm \
    --base "--envs 64 --evaluate_freq 25600 --snapshot_freq 2000000 \
            --no-snapshot_memory --offense_agents 3 --defense_chasers 1 \
            --defense_npcs 2 --share_actor_layers 4 --share_critic_layers 4 \
            --share_replay_memory --action_space mid_level \
            --max_iter 1200000 --explore 20000 \
            --actor_weights $AW,$AW,$AW --critic_weights $CW,$CW,$CW"
fi

# ---- stage D (fast-mode consolidation) ----
# b256_match seed 1 reached goal 0.82 at EXACTLY the parity gradient-
# sample budget (125k steps x 256 = 32M samples) in half the wall time;
# multi-seed it, multi-seed the 4x-budget batch-1024 point, and run the
# 1v1-chaser config in fast mode (VERDICT r3 #1).
B="--envs 128 --snapshot_freq 10000000 --no-snapshot_memory"
python scripts/exps.py --save_root runs/r4_fast_b/b256_match --grid "seed=2,3" \
  --base "$B --minibatch 256 --update_ratio 0.0125 --max_iter 125000 \
          --explore 1250 --evaluate_freq 3200 --loss_display_iter 125"
python scripts/exps.py --save_root runs/r4_fast_b/b1024_x4 --grid "seed=2,3" \
  --base "$B --minibatch 1024 --update_ratio 0.0125 --max_iter 125000 \
          --explore 1250 --evaluate_freq 3200 --loss_display_iter 125"
python scripts/exps.py --save_root runs/r4_fast_1v1 --repeat 3 \
  --base "$B --defense_chasers 1 --action_space mid_level \
          --minibatch 256 --update_ratio 0.0125 --max_iter 125000 \
          --explore 2500 --evaluate_freq 3200 --loss_display_iter 125"
