#!/bin/bash
# Round-5 master TPU ladder (the earlier r5 sandbox lost its runs/ tree;
# this re-runs the round's evidence in VERDICT-priority order, sized to
# the ~3h wall budget; every stage is exps.py-resumable).
#
#  1) VERDICT #1: ONE-recipe hard rung — explore 20k + stagnation-
#     triggered anneal restarts (runtime/loop.py _maybe_restart_anneal),
#     7 seeds, 2M iters.  Static 20k leaves seeds 2/7 plateaued (r4:
#     0.49/0.66); static 40k fixes those but delays other seeds' takeoff
#     (prior r5 session: seed 4 still 0.58 at 3M).  The restart rule
#     spends extra exploration only on seeds that demonstrate the
#     plateau.
#  2) VERDICT #2 (source): 2v2 sharing run, 1.2M — refreshes the r4
#     ablation share arm AND provides the 3v3 warm-start snapshot.
#  3) VERDICT #2: 3v3 warm curriculum, 3 seeds (r4 had one trajectory).
#  4) VERDICT #3: fast-mode 2v2 under the serialized share semantics —
#     the validated throughput lever for the latency-bound coupled
#     path (batch 1024, 8x fewer sequential steps; prior session: the
#     batched share mode did NOT move the rate — it is latency-bound,
#     not unroll-bound).
#  5) VERDICT #4: the reference's ACTUAL recorded 2v1 experiment
#     (train.sh:41-53): 2 learning agents, -defense_npcs 1,
#     -offense_on_ball 10, -ball_x_min 0.6; share-2 / no-share /
#     shared-replay arms.
set -e
cd "$(dirname "$0")/.."

# --- 1: adaptive-exploration hard rung, 7 seeds x 2M ------------------
bash scripts/protocol_r5_adaptive.sh

# --- 2: 2v2 share 1.2M (ablation anchor refresh + warm source) --------
MA="--envs 64 --evaluate_freq 25600 --snapshot_freq 1200000 \
    --no-snapshot_memory --defense_chasers 1 --defense_npcs 1 \
    --action_space mid_level --explore 20000"
python scripts/exps.py --save_root runs/r5_2v2_share \
  --base "$MA --offense_agents 2 --share_actor_layers 4 \
          --share_critic_layers 4 --share_replay_memory \
          --max_iter 1200000 --seed 1"

# --- 3: 3v3 warm curriculum, 3 seeds x 1.6M ---------------------------
ACTOR=$(ls runs/r5_2v2_share/base_actor_iter_*.npz 2>/dev/null | tail -1)
CRITIC=$(ls runs/r5_2v2_share/base_critic_iter_*.npz 2>/dev/null | tail -1)
if [ -n "$ACTOR" ]; then
  python scripts/split_snapshot.py "$ACTOR" runs/r5_2v2_share/warm_actor \
      --remap 1,2,2,3
  python scripts/split_snapshot.py "$CRITIC" runs/r5_2v2_share/warm_critic \
      --remap 1,2,2,3
  AW=runs/r5_2v2_share/warm_actor_agent0.npz
  CW=runs/r5_2v2_share/warm_critic_agent0.npz
  python scripts/exps.py --save_root runs/r5_3v3_warm --grid "seed=1,2,3" \
    --base "--envs 64 --evaluate_freq 25600 --snapshot_freq 2000000 \
            --no-snapshot_memory --offense_agents 3 --defense_chasers 1 \
            --defense_npcs 2 --share_actor_layers 4 --share_critic_layers 4 \
            --share_replay_memory --action_space mid_level \
            --max_iter 1200000 --explore 20000 \
            --actor_weights $AW,$AW,$AW --critic_weights $CW,$CW,$CW"
fi

# --- 5 (moved before 4 — wall-budget priority): reference 2v1 ---------
REF2V1="--envs 64 --evaluate_freq 25600 --snapshot_freq 1000000 \
    --no-snapshot_memory --offense_agents 2 --defense_npcs 1 \
    --offense_on_ball 10 --ball_x_min 0.6 \
    --action_space mid_level --max_iter 600000 --explore 20000"
python scripts/exps.py --save_root runs/r5_ref2v1_share2 --grid "seed=1,2" \
  --base "$REF2V1 --share_actor_layers 2 --share_critic_layers 2"
python scripts/exps.py --save_root runs/r5_ref2v1_noshare --grid "seed=1,2" \
  --base "$REF2V1"

# --- 4: fast-mode 2v2 (serialized share semantics) --------------------
MA2="--defense_chasers 1 --defense_npcs 1 --action_space mid_level \
     --offense_agents 2 --share_actor_layers 4 --share_critic_layers 4 \
     --share_replay_memory --no-snapshot_memory --snapshot_freq 10000000 \
     --envs 64 --minibatch 1024"
python scripts/exps.py --save_root runs/r5_fast2v2_serial --grid "seed=1,2" \
  --base "$MA2 --update_ratio 0.0125 --max_iter 150000 --explore 2500 \
          --evaluate_freq 3200 --loss_display_iter 125"
python scripts/exps.py --save_root runs/r5_fast2v2_300k \
  --base "$MA2 --update_ratio 0.025 --max_iter 300000 --explore 5000 \
          --evaluate_freq 6400 --loss_display_iter 250 --seed 1"

echo "LADDER COMPLETE"
