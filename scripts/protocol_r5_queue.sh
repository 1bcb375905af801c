#!/bin/bash
# Round-5 continuation queue (single-tenant TPU, strictly serialized):
#  1) VERDICT #8 — DP-learns evidence: full-budget 1v0 through the
#     production DataParallel superstep (--mesh_devices 1; the DP
#     equivalence suite pins 1-device mesh == unsharded bitwise).
#  2) VERDICT #4 — the reference's ACTUAL recorded 2v1 experiments
#     (train.sh:41-53): 2 learning agents, -defense_npcs 1
#     -offense_on_ball 10 -ball_x_min 0.6, low-level actions (the
#     reference default), three arms x 2 seeds at 600k:
#       a) noshare baseline (no sharing of any kind)
#       b) sharedreplay (the 6-1-16 sharedreplay_2v1 job)
#       c) shareparam_2 + beta 0.2 (the 6-1-16 shareparam_2v1_2 job)
#  3) VERDICT weak #3 — profiled short 2v2 run for the trace analysis.
#  4) VERDICT #2 option B — 3v3 curriculum stage 2: re-warm the three
#     learners' ACTORS from the best committed stage-1 policy (r4's
#     0.56 HiScore actor), fresh critics + fresh replay + fresh anneal.
set -e
cd "$(dirname "$0")/.."

python scripts/exps.py --save_root runs/r5_dp_mesh1 \
  --base "--envs 128 --mesh_devices 1 --max_iter 1000000 --explore 10000 \
          --evaluate_freq 25600 --snapshot_freq 1000000 \
          --no-snapshot_memory --seed 1"

REF2V1="--offense_agents 2 --defense_npcs 1 --offense_on_ball 10 \
        --ball_x_min 0.6 --envs 64 --max_iter 600000 --explore 20000 \
        --evaluate_freq 25600 --snapshot_freq 10000000 --no-snapshot_memory"

python scripts/exps.py --save_root runs/r5_ref2v1_noshare --repeat 2 \
  --base "$REF2V1"
python scripts/exps.py --save_root runs/r5_ref2v1_sharedreplay --repeat 2 \
  --base "$REF2V1 --share_replay_memory"
python scripts/exps.py --save_root runs/r5_ref2v1_shareparam2 --repeat 2 \
  --base "$REF2V1 --beta 0.2 --share_actor_layers 2 --share_critic_layers 2"

python scripts/exps.py --save_root runs/r5_2v2_profile \
  --base "--defense_chasers 1 --defense_npcs 1 --action_space mid_level \
          --offense_agents 2 --share_actor_layers 4 --share_critic_layers 4 \
          --share_replay_memory --no-snapshot_memory \
          --snapshot_freq 10000000 --envs 64 --max_iter 60000 \
          --explore 2000 --evaluate_freq 1000000 \
          --profile_dir runs/r5_2v2_profile/trace --seed 1"

mkdir -p runs/r5_3v3_stage2
python scripts/split_snapshot.py \
    results/r4_3v3_warm_HiScore0.56_actor.npz \
    runs/r5_3v3_stage2/warm_actor
A0=runs/r5_3v3_stage2/warm_actor_agent0.npz
A1=runs/r5_3v3_stage2/warm_actor_agent1.npz
A2=runs/r5_3v3_stage2/warm_actor_agent2.npz
python scripts/exps.py --save_root runs/r5_3v3_stage2 \
  --base "--envs 64 --evaluate_freq 25600 --snapshot_freq 2000000 \
          --no-snapshot_memory --offense_agents 3 --defense_chasers 1 \
          --defense_npcs 2 --share_actor_layers 4 --share_critic_layers 4 \
          --share_replay_memory --action_space mid_level \
          --max_iter 1200000 --explore 20000 \
          --actor_weights $A0,$A1,$A2 --seed 4"

echo "R5 QUEUE COMPLETE"
