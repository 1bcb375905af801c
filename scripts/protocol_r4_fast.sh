#!/bin/bash
# Round-4 fast-mode protocol (VERDICT r3 #1): prove the non-parity
# minibatch-1024 mode LEARNS at matched budgets, not just benchmarks.
#
# Budget matching vs the 1v0 reference config (1M iters, batch 32,
# update_ratio 0.1): gradient samples 31250*1024 == 1M*32; env steps
# 31250/0.003125 == 1M/0.1 == 10M.  Iteration-denominated knobs
# (explore, evaluate_freq, loss_display) scale by 32.
#
# Stage A: lr/tau scaling scan, 1 fixed seed per point.  Adam's
# invariance to gradient scale means 32x fewer steps needs a larger
# step size: sqrt(32)=5.7x is the standard large-batch Adam recipe,
# linear 32x the aggressive end; tau (target-net time constant in
# iterations) is scaled linearly to keep the same fraction-of-run lag.
set -e
cd "$(dirname "$0")/.."
FAST="--envs 128 --minibatch 1024 --update_ratio 0.003125 --max_iter 31250 \
      --explore 313 --evaluate_freq 800 --loss_display_iter 32 \
      --snapshot_freq 1000000 --no-snapshot_memory --seed 1"

python scripts/exps.py --save_root runs/r4_fast_scan/ctrl \
  --base "$FAST --actor_lr 1e-5   --critic_lr 1e-3   --tau 0.001"
python scripts/exps.py --save_root runs/r4_fast_scan/sqrt \
  --base "$FAST --actor_lr 5.7e-5 --critic_lr 5.7e-3 --tau 0.0057"
python scripts/exps.py --save_root runs/r4_fast_scan/sqrtlr_lintau \
  --base "$FAST --actor_lr 5.7e-5 --critic_lr 5.7e-3 --tau 0.032"
python scripts/exps.py --save_root runs/r4_fast_scan/mid \
  --base "$FAST --actor_lr 1.6e-4 --critic_lr 1.6e-2 --tau 0.032"
python scripts/exps.py --save_root runs/r4_fast_scan/linear \
  --base "$FAST --actor_lr 3.2e-4 --critic_lr 3.2e-2 --tau 0.032"
