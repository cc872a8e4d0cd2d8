#!/usr/bin/env bash
# Final-stretch queue v2.  The winsorized-KL run (queue_r5d) un-throttled
# the LR exactly as measured (mean 2.24e-4, zero KL>1 rows) — and then a
# value-loss excursion at ~245.6k ran the noise spiral to the 1.5 rail
# in ~2k iters (noise 1.48, terrain_level 0.57 at 248k): the rogue-KL
# readings the winsor removed had been acting as a de-facto storm brake
# (they railed the LR to 1e-5 during exactly these episodes).  Keep the
# winsor's throughput but replace the accidental brake with the
# DELIBERATE one: algorithm.max_noise_std=0.7 — healthy noise is
# 0.42-0.48, storms previously plateaued 0.9-1.5, so the rail binds only
# in the spiral and the policy keeps walking while the critic refits.
# Post-245k checkpoints quarantined (storm_248k_quarantine/).
set -u
cd "$(dirname "$0")/.."
LOG=logs/pointfoot_rough/tpu_r4_storm
COMMON=(--task=pointfoot_rough --num_envs 4096 --log_every 50
  --override terrain.procedural=true
  --override rewards.clip_reward=20.0
  --override terrain.stairs_up_height_cap=0.12
  --override terrain.cmd_conditioned_promotion=true
  --train_override algorithm.kl_winsor=1.0
  --train_override algorithm.max_noise_std=0.7
  --train_override runner.save_interval=1000)
latest=$(ls "$LOG" | grep -E '^model_[0-9]+$' | sed 's/model_//' | sort -n | tail -1)
reentry=$((latest + 4000))
echo "[queue_r5e] re-entry: $latest -> $reentry at max_lr=1e-4"
STALE_S=2400 bash scripts/train_watchdog.sh "$LOG" "$reentry" \
  "${COMMON[@]}" --train_override algorithm.max_lr=1e-4
echo "[queue_r5e] main: -> 300k at max_lr=2.5e-4"
STALE_S=2400 exec bash scripts/train_watchdog.sh "$LOG" 300000 \
  "${COMMON[@]}" --train_override algorithm.max_lr=2.5e-4
