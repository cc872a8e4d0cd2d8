#!/usr/bin/env bash
# Overnight stable run: the calm recipe (plain KL + clip_reward=20 +
# stairs cap + cmd-conditioned promotion + noise rail 0.7) from the calm
# model_245000, as far as it gets before round end.  Checkpoints every
# 1000; storm guard alarms via the watchdog.
set -u
cd "$(dirname "$0")/.."
LOG=logs/pointfoot_rough/tpu_r4_storm
COMMON=(--task=pointfoot_rough --num_envs 4096 --log_every 50
  --override terrain.procedural=true
  --override rewards.clip_reward=20.0
  --override terrain.stairs_up_height_cap=0.12
  --override terrain.cmd_conditioned_promotion=true
  --train_override algorithm.max_noise_std=0.7
  --train_override runner.save_interval=1000)
latest=$(ls "$LOG" | grep -E '^model_[0-9]+$' | sed 's/model_//' | sort -n | tail -1)
reentry=$((latest + 4000))
echo "[queue_r5f] re-entry: $latest -> $reentry at max_lr=1e-4"
STALE_S=2400 bash scripts/train_watchdog.sh "$LOG" "$reentry" \
  "${COMMON[@]}" --train_override algorithm.max_lr=1e-4
echo "[queue_r5f] main: -> 400k at max_lr=2.5e-4 (runs until round end)"
STALE_S=2400 exec bash scripts/train_watchdog.sh "$LOG" 400000 \
  "${COMMON[@]}" --train_override algorithm.max_lr=2.5e-4
