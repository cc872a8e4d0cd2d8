#!/usr/bin/env bash
# Round-5 flat low-command tracking A/B (VERDICT r4 item 2).
#
# Baseline (tpu_r4_ft/model_55000, eval_55000.json): cmd 0.25 -> 0.456
# (+82%), 0.5 -> 0.643 (+29%), 1.0 -> 0.93 (-7%), stand-creep 0.051.
# Deviation under test: rewards.tracking_rel_vref=1.0 (command-relative
# tracking width — equal RELATIVE-error selectivity at every command
# magnitude; tests/test_tracking_rel.py).  One lever, resumed from the
# committed 55k checkpoint like the stairs-cap A/B.  The knob shrinks
# the average tracking reward (stricter), so the value function must
# refit — cap the adaptive LR at 1e-4 for the continuation (the
# round-4 resume-instability lesson).
#
# Usage: scripts/queue_r5_flat.sh [TARGET_ITERS]   (default 70000 = +15k)
set -u
cd "$(dirname "$0")/.."

TARGET=${1:-70000}
LOG=logs/pointfoot_flat/tpu_r5_cal
mkdir -p "$LOG"
# seed the run dir from the committed 55k checkpoint once
if ! ls "$LOG" | grep -q '^model_'; then
  cp -r logs/pointfoot_flat/tpu_r4_ft/model_55000 "$LOG/model_55000"
fi

STALE_S=2400 exec bash scripts/train_watchdog.sh "$LOG" "$TARGET" \
  --task=pointfoot_flat --num_envs 4096 --log_every 50 \
  --override rewards.tracking_rel_vref=1.0 \
  --train_override algorithm.max_lr=1e-4 \
  --train_override runner.save_interval=1000
