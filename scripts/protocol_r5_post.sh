#!/bin/bash
# Round-5 post-ladder TPU stage (run AFTER protocol_r5_run.sh drains):
#  1) DP-learns evidence (VERDICT #8): a full-budget 1v0 run through the
#     production DataParallel superstep (--mesh_devices 1; the DP
#     equivalence suite pins 1-device mesh == unsharded bitwise, so this
#     exercises the sharded program structure at a learnable budget).
#     A 2-shard CPU-mesh continuation from its snapshot follows on the
#     host (see RESULTS.md "Distribution") — a from-scratch multi-shard
#     CPU learning run remains out of reach on this 2-core host.
#  2) 3v3 curriculum SECOND STAGE (VERDICT #2 option B): re-warm all
#     three learners from the best stage-1 3v3 policy (same topology,
#     split into per-agent files; fresh replay + fresh anneal) and train
#     another 1.2M — does a restarted exploration schedule break the
#     0.24 stage-1 ceiling?
#  3) Profiled short 2v2 run for the committed trace analysis
#     (VERDICT weak #3).
set -e
cd "$(dirname "$0")/.."

python scripts/exps.py --save_root runs/r5_dp_mesh1 \
  --base "--envs 128 --mesh_devices 1 --max_iter 1000000 --explore 10000 \
          --evaluate_freq 25600 --snapshot_freq 1000000 \
          --no-snapshot_memory --seed 1"

python scripts/split_snapshot.py \
    runs/r5_3v3_warm/seed1_HiScore0.24_actor_iter_537600.npz \
    runs/r5_3v3_warm/stage2_actor
python scripts/split_snapshot.py \
    runs/r5_3v3_warm/seed1_HiScore0.24_critic_iter_537600.npz \
    runs/r5_3v3_warm/stage2_critic
A0=runs/r5_3v3_warm/stage2_actor_agent0.npz
A1=runs/r5_3v3_warm/stage2_actor_agent1.npz
A2=runs/r5_3v3_warm/stage2_actor_agent2.npz
C0=runs/r5_3v3_warm/stage2_critic_agent0.npz
C1=runs/r5_3v3_warm/stage2_critic_agent1.npz
C2=runs/r5_3v3_warm/stage2_critic_agent2.npz
python scripts/exps.py --save_root runs/r5_3v3_stage2 \
  --base "--envs 64 --evaluate_freq 25600 --snapshot_freq 2000000 \
          --no-snapshot_memory --offense_agents 3 --defense_chasers 1 \
          --defense_npcs 2 --share_actor_layers 4 --share_critic_layers 4 \
          --share_replay_memory --action_space mid_level \
          --max_iter 1200000 --explore 20000 \
          --actor_weights $A0,$A1,$A2 --critic_weights $C0,$C1,$C2 --seed 4"

python scripts/exps.py --save_root runs/r5_2v2_profile \
  --base "--defense_chasers 1 --defense_npcs 1 --action_space mid_level \
          --offense_agents 2 --share_actor_layers 4 --share_critic_layers 4 \
          --share_replay_memory --no-snapshot_memory \
          --snapshot_freq 10000000 --envs 64 --max_iter 60000 \
          --explore 2000 --evaluate_freq 1000000 \
          --profile_dir runs/r5_2v2_profile/trace --seed 1"

echo "POST STAGE COMPLETE"
