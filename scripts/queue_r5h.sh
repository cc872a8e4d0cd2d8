#!/usr/bin/env bash
# Round-5 flat low-command tracking, dose 3 (VERDICT r4 item 2, flat half).
#
# Dose 2 (queue_r5g.sh) + the ROBUST probe (64 envs x 20 s; the 16x10
# probe's seed spread at cmd 0.25 is +-28%, which was most of the
# "oscillation") found model_82000 at -5%/-9%/+12% for cmd
# 0.25/0.5/1.0 with 0 falls.  Dose 3 continues from 82k with the LR cap
# halved (5e-5) to damp the checkpoint-to-checkpoint drift (KL ~0.0035
# at 1e-4) and close the last gap (cmd-1.0 +12%, stand-creep 0.099).
#
# Usage: scripts/queue_r5h.sh [TARGET_ITERS]   (default 92000 = +10k)
set -u
cd "$(dirname "$0")/.."

TARGET=${1:-92000}
LOG=logs/pointfoot_flat/tpu_r5_os2
mkdir -p "$LOG"
if ! ls "$LOG" | grep -q '^model_'; then
  cp -r logs/pointfoot_flat/tpu_r5_os/model_82000 "$LOG/model_82000"
fi

STALE_S=2400 exec bash scripts/train_watchdog.sh "$LOG" "$TARGET" \
  --task=pointfoot_flat --num_envs 4096 --log_every 50 \
  --override rewards.tracking_rel_vref=1.0 \
  --override commands.low_cmd_oversample=0.35 \
  --override commands.low_cmd_band=0.6 \
  --train_override algorithm.max_lr=5e-5 \
  --train_override runner.save_interval=1000
