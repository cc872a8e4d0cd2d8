#!/usr/bin/env bash
# Round-5 flat low-command tracking, dose 2 (VERDICT r4 item 2, flat half).
#
# Dose 1 (queue_r5_flat.sh, tracking_rel_vref=1.0, 55k->70k) moved
# cmd 0.25 from +82% to +24% but further training OSCILLATES (75/80/85k:
# max errors 28/66/49%) — the sharpened gradient is sample-starved
# (~10% of episodes in the 0.2-0.4 band).  Dose 2 adds the oversampling
# lever (commands.low_cmd_oversample=0.35, band widened to 0.6 so BOTH
# acceptance points below 1.0 — cmd 0.25 AND cmd 0.5, the −15%
# undershoot — are covered: ~41% of vx draws land in [0.2, 0.6]) and
# continues from the committed best (model_70000).  Same re-entry LR cap
# as every continuation (max_lr=1e-4).
#
# Usage: scripts/queue_r5g.sh [TARGET_ITERS]   (default 85000 = +15k)
set -u
cd "$(dirname "$0")/.."

TARGET=${1:-85000}
LOG=logs/pointfoot_flat/tpu_r5_os
mkdir -p "$LOG"
if ! ls "$LOG" | grep -q '^model_'; then
  cp -r logs/pointfoot_flat/tpu_r5_cal/model_70000 "$LOG/model_70000"
fi

STALE_S=2400 exec bash scripts/train_watchdog.sh "$LOG" "$TARGET" \
  --task=pointfoot_flat --num_envs 4096 --log_every 50 \
  --override rewards.tracking_rel_vref=1.0 \
  --override commands.low_cmd_oversample=0.35 \
  --override commands.low_cmd_band=0.6 \
  --train_override algorithm.max_lr=1e-4 \
  --train_override runner.save_interval=1000
