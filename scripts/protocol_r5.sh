#!/bin/bash
# Round-5 experiment ladder (VERDICT r4 "next round" asks):
#  A) 2v2 sharing ablation re-run under the NEW batched share mode
#     (learner/multi.py share_mode="batched", the vmapped once-per-
#     iteration prefix reconciliation) — validates that the fast path
#     preserves the sharing capability (r4 serialized: 0.51 share vs
#     0.11 noshare).
#  B) The reference's ACTUAL recorded 2v1 experiment configuration
#     (train.sh:41-53): 2 learning agents, -defense_npcs 1,
#     -offense_on_ball 10, -ball_x_min 0.6; share (2+2 layers, the
#     shareparam_2v1_2 config) and no-share arms, 2 seeds each, plus the
#     sharedreplay_2v1 arm.  mid_level actions per the repo's
#     multi-agent ladder convention (RESULTS.md).
#  C) 3v3 warm curriculum, MULTI-SEED (r4 had one trajectory): 3 seeds
#     warm-started from the same r4 2v2 policy remap, budget extended
#     to 2M iters.
set -e
cd "$(dirname "$0")/.."

MA="--envs 64 --evaluate_freq 25600 --snapshot_freq 1000000 \
    --no-snapshot_memory --defense_chasers 1 --defense_npcs 1 \
    --action_space mid_level --max_iter 1200000 --explore 20000"

# --- A: batched-share-mode 2v2 ablation (2 seeds share, 1 noshare ctrl)
python scripts/exps.py --save_root runs/r5_2v2_share_batched --grid "seed=1,2" \
  --base "$MA --offense_agents 2 --share_actor_layers 4 \
          --share_critic_layers 4 --share_replay_memory"

# --- B: the reference's recorded 2v1 configuration ---------------------
REF2V1="--envs 64 --evaluate_freq 25600 --snapshot_freq 1000000 \
    --no-snapshot_memory --offense_agents 2 --defense_npcs 1 \
    --offense_on_ball 10 --ball_x_min 0.6 \
    --action_space mid_level --max_iter 600000 --explore 20000"
python scripts/exps.py --save_root runs/r5_ref2v1_share2 --grid "seed=1,2" \
  --base "$REF2V1 --share_actor_layers 2 --share_critic_layers 2"
python scripts/exps.py --save_root runs/r5_ref2v1_noshare --grid "seed=1,2" \
  --base "$REF2V1"
python scripts/exps.py --save_root runs/r5_ref2v1_sharedreplay \
  --base "$REF2V1 --share_replay_memory --seed 1"

# --- C: 3v3 warm curriculum, 3 seeds, 2M iters -------------------------
AW=runs/r4_2v2_share/warm_actor_agent0.npz
CW=runs/r4_2v2_share/warm_critic_agent0.npz
if [ -f "$AW" ]; then
  python scripts/exps.py --save_root runs/r5_3v3_warm --grid "seed=1,2,3" \
    --base "--envs 64 --evaluate_freq 25600 --snapshot_freq 2000000 \
            --no-snapshot_memory --offense_agents 3 --defense_chasers 1 \
            --defense_npcs 2 --share_actor_layers 4 --share_critic_layers 4 \
            --share_replay_memory --action_space mid_level \
            --max_iter 2000000 --explore 20000 \
            --actor_weights $AW,$AW,$AW --critic_weights $CW,$CW,$CW"
fi
