#!/usr/bin/env bash
# Round-5 storm-recovery queue: the 22:52 forced relaunch (tunnel hang
# during a bench-lock drain) resumed 209k and stormed within ~2.5k iters
# (noise_std 0.44 -> 0.91, tracking 4.5 -> 2.7; docs/ROUND5_NOTES.md §3b)
# even under clip_reward=20 + max_lr=2.5e-4 — the resume restarts all
# 4096 episodes synchronized, and the stale critic on that shifted batch
# distribution is the known ignition.  Post-209k checkpoints are
# quarantined (storm_213k_quarantine/).  Recovery: resume the pre-storm
# model_209000 with a TIGHTER re-entry cap (max_lr=1e-4) for a 10k
# stabilization segment, then lift back to 2.5e-4 for the run to 300k.
set -u
cd "$(dirname "$0")/.."

LOG=logs/pointfoot_rough/tpu_r4_storm
COMMON=(--task=pointfoot_rough --num_envs 4096 --log_every 50
  --override terrain.procedural=true
  --override rewards.clip_reward=20.0
  --override terrain.stairs_up_height_cap=0.12
  --train_override runner.save_interval=1000)

echo "[queue_r5b] segment A: 209k -> 219k at max_lr=1e-4 (re-entry)"
STALE_S=2400 bash scripts/train_watchdog.sh "$LOG" 219000 \
  "${COMMON[@]}" --train_override algorithm.max_lr=1e-4

echo "[queue_r5b] segment B: -> 300k at max_lr=2.5e-4"
STALE_S=2400 exec bash scripts/train_watchdog.sh "$LOG" 300000 \
  "${COMMON[@]}" --train_override algorithm.max_lr=2.5e-4
