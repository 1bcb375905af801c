#!/bin/bash
# Learning-curve parity protocol — the reference's regression harness
# (train.sh:116-124 2v2 sharing topologies, :245-258 single-agent regression)
# as a committed, resumable sweep spec.  Runs execute sequentially (the TPU
# grant is single-tenant); each exps.py sweep skips grid points already done,
# so re-running this script resumes where it stopped.
#
#   bash scripts/protocol.sh            # full protocol (~1-2h on one chip)
#
# Ordered novel-evidence-first: the 2v1 passing proof and the 2v2 sharing
# ablation have no round-1 counterpart, so they run before the multi-seed
# repeats of the already-demonstrated 1v0/1v1 configs.
#
# Results land under runs/: per-run metrics jsonl + manifest.jsonl summaries.
# Plot with: python scripts/curves.py runs/r3_1v0 runs/r3_1v1 -o curves.png
set -e
cd "$(dirname "$0")/.."

COMMON="--envs 128 --evaluate_freq 25600 --snapshot_freq 1000000 --no-snapshot_memory"

# 1) 2v1 passing curriculum (train.sh:116-150): learner + agent2d teammate
#    vs the keeper — the pass_reward latch must fire (passes metric > 0)
python scripts/exps.py --save_root runs/r3_2v1 --repeat 2 \
  --base "$COMMON --offense_npcs 1 --defense_chasers 1 \
          --action_space mid_level --max_iter 600000 --explore 20000"

# 2) 2v2 sharing ablation: 2 learning agents vs keeper+agent2d defender,
#    with and without first-4-layer sharing + shared replay (dqn.cpp:1037-1083)
MA="--envs 64 --evaluate_freq 25600 --snapshot_freq 1000000 --no-snapshot_memory \
    --offense_agents 2 --defense_chasers 1 --defense_npcs 1 \
    --action_space mid_level --max_iter 600000 --explore 20000"
python scripts/exps.py --save_root runs/r3_2v2_share \
  --base "$MA --share_actor_layers 4 --share_critic_layers 4 --share_replay_memory"
python scripts/exps.py --save_root runs/r3_2v2_noshare --base "$MA"

# 3) 3 seeds of 1v0 empty goal, reference hyperparameters (BASELINE config 3)
python scripts/exps.py --save_root runs/r3_1v0 --repeat 3 \
  --base "$COMMON --max_iter 1000000 --explore 10000"

# 4) 3 seeds of 1v1 vs the chaser keeper (mid-level macro actions)
python scripts/exps.py --save_root runs/r3_1v1 --repeat 3 \
  --base "$COMMON --defense_chasers 1 --action_space mid_level \
          --max_iter 1000000 --explore 20000"

# 5) (round 3 additions) 1v1 vs the agent2d stand-in keeper — the hardest
#    ladder rung (results/npc_ladder.json); reference regime: HiScore 0.8
#    at 5.9M iters vs real agent2d (train.sh:79-80)
python scripts/exps.py --save_root runs/r3_1v1_agent2d --repeat 2 \
  --base "--envs 128 --evaluate_freq 51200 --snapshot_freq 2000000 \
          --no-snapshot_memory --defense_npcs 1 --action_space mid_level \
          --max_iter 2000000 --explore 20000"

# 6) replay-producing 1v0 run + offline critic_lr sweep over its fixed
#    memory (the reference's offline regression, train.sh:378-407)
python scripts/exps.py --save_root runs/r3_1v0_mem \
  --base "$COMMON --max_iter 200000 --explore 10000 --snapshot_memory"
MEM=$(ls runs/r3_1v0_mem/base_iter_*.replaymemory.npz 2>/dev/null | tail -1)
if [ -n "$MEM" ]; then
  python scripts/exps.py --save_root runs/r3_lr_offline \
    --grid "critic_lr=1e-2,1e-3,1e-4" \
    --base "--learn_offline --memory_snapshot $MEM --envs 128 \
            --max_iter 50000 --memory 500000"
fi

# 7) beta ablation on 1v0 (the reference's beta sweeps)
python scripts/exps.py --save_root runs/r3_beta_seeds --repeat 2 \
  --grid "beta=0.0,0.5,1.0" \
  --base "$COMMON --max_iter 800000 --explore 10000"
