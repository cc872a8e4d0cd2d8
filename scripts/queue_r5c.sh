#!/usr/bin/env bash
# Round-5 curriculum-lever queue: continue tpu_r4_storm with the
# command-conditioned promotion knob added (the capped run's slope bent —
# global +0.04/10k over 190k-219k; see the commit adding
# terrain.cmd_conditioned_promotion).  Re-entry segment at max_lr=1e-4
# first (resume-storm protection, cf. queue_r5b), then full cap to 300k.
set -u
cd "$(dirname "$0")/.."

LOG=logs/pointfoot_rough/tpu_r4_storm
COMMON=(--task=pointfoot_rough --num_envs 4096 --log_every 50
  --override terrain.procedural=true
  --override rewards.clip_reward=20.0
  --override terrain.stairs_up_height_cap=0.12
  --override terrain.cmd_conditioned_promotion=true
  --train_override runner.save_interval=1000)

latest=$(ls "$LOG" | grep -E '^model_[0-9]+$' | sed 's/model_//' | sort -n | tail -1)
reentry=$((latest + 5000))
echo "[queue_r5c] re-entry: $latest -> $reentry at max_lr=1e-4"
STALE_S=2400 bash scripts/train_watchdog.sh "$LOG" "$reentry" \
  "${COMMON[@]}" --train_override algorithm.max_lr=1e-4

echo "[queue_r5c] main: -> 300k at max_lr=2.5e-4"
STALE_S=2400 exec bash scripts/train_watchdog.sh "$LOG" 300000 \
  "${COMMON[@]}" --train_override algorithm.max_lr=2.5e-4
