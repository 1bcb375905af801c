#!/bin/bash
# Fast-mode stage B: stage A showed batch-1024 at MATCHED gradient-sample
# budget (32x fewer Adam steps) does not learn 1v0, and lr upscaling makes
# it worse — DDPG's bootstrap appears step-count-bound, not sample-bound.
# Test that hypothesis and the wall-clock framing:
#  - b256_match : batch 256, update_ratio 0.0125 -> 125k steps x 256
#                 = 32M samples (EXACTLY the parity budget, 8x fewer steps)
#  - b1024_x4   : batch 1024, update_ratio 0.0125 -> 125k steps, 4x the
#                 sample budget; if step count is what matters this should
#                 learn, and its coupled rate still beats parity wall-clock
#  - b1024_x8   : batch 1024, update_ratio 0.025 -> 250k steps, 8x samples
# Reference lr/tau (stage A: scaling lr hurt).
set -e
cd "$(dirname "$0")/.."
B="--envs 128 --snapshot_freq 10000000 --no-snapshot_memory --seed 1"

python scripts/exps.py --save_root runs/r4_fast_b/b256_match \
  --base "$B --minibatch 256 --update_ratio 0.0125 --max_iter 125000 \
          --explore 1250 --evaluate_freq 3200 --loss_display_iter 125"
python scripts/exps.py --save_root runs/r4_fast_b/b1024_x4 \
  --base "$B --minibatch 1024 --update_ratio 0.0125 --max_iter 125000 \
          --explore 1250 --evaluate_freq 3200 --loss_display_iter 125"
python scripts/exps.py --save_root runs/r4_fast_b/b1024_x8 \
  --base "$B --minibatch 1024 --update_ratio 0.025 --max_iter 250000 \
          --explore 2500 --evaluate_freq 6400 --loss_display_iter 250"
