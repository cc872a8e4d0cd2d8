#!/usr/bin/env bash
# Final-stretch queue: command-conditioned promotion + winsorized KL
# (algorithm.kl_winsor=1.0) so the adaptive LR stops railing on rogue
# samples (measured mean lr 1.06e-4 vs the 2.5e-4 cap, 37% of rows
# KL > 1 with health flat).  Short 1e-4 re-entry first (resume pattern).
set -u
cd "$(dirname "$0")/.."
LOG=logs/pointfoot_rough/tpu_r4_storm
COMMON=(--task=pointfoot_rough --num_envs 4096 --log_every 50
  --override terrain.procedural=true
  --override rewards.clip_reward=20.0
  --override terrain.stairs_up_height_cap=0.12
  --override terrain.cmd_conditioned_promotion=true
  --train_override algorithm.kl_winsor=1.0
  --train_override runner.save_interval=1000)
latest=$(ls "$LOG" | grep -E '^model_[0-9]+$' | sed 's/model_//' | sort -n | tail -1)
reentry=$((latest + 4000))
echo "[queue_r5d] re-entry: $latest -> $reentry at max_lr=1e-4 (winsor on)"
STALE_S=2400 bash scripts/train_watchdog.sh "$LOG" "$reentry" \
  "${COMMON[@]}" --train_override algorithm.max_lr=1e-4
echo "[queue_r5d] main: -> 300k at max_lr=2.5e-4"
STALE_S=2400 exec bash scripts/train_watchdog.sh "$LOG" 300000 \
  "${COMMON[@]}" --train_override algorithm.max_lr=2.5e-4
