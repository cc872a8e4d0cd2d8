#!/usr/bin/env bash
# Round-4b: flat tracking recalibration.  The tpu_r3_ft2 45k artifact was
# fine-tuned under the broken gen-2 physics whose faded contact dragged
# forward speed — under the repaired gen-3 physics it overshoots
# (cmd 0.5 -> 0.645, cmd 1.0 -> 1.209; eval_45000_r4physics.json) though
# with 0 falls.  Continue +10k iterations under gen-3 so the velocity
# tracking re-calibrates; LR capped as in queue_r4.sh.
set -u
cd "$(dirname "$0")/.."

FT=logs/pointfoot_flat/tpu_r4_ft
mkdir -p "$FT"
if [ ! -e "$FT/model_45000" ]; then
  cp -r logs/pointfoot_flat/tpu_r3_ft2/model_45000 "$FT/model_45000"
fi
STALE_S=${STALE_S:-2400} bash scripts/train_watchdog.sh "$FT" 55000 \
  --task=pointfoot_flat --num_envs 4096 --log_every 50 \
  --train_override algorithm.max_lr=2.5e-4 \
  --train_override runner.save_interval=500
last=$(ls "$FT" | grep -E '^model_[0-9]+$' | sed 's/model_//' | sort -n | tail -1)
if [ -n "${last:-}" ] && [ "$last" -ge 55000 ]; then
  JAX_PLATFORMS=cpu timeout 2400 python scripts/eval_policy.py \
    --task pointfoot_flat --load_run "$FT/model_$last" \
    --vx 0.0 0.25 0.5 1.0 > "$FT/eval_$last.json" 2>/tmp/eval_r4ft_err.log
  bash scripts/commit_ckpt.sh "$FT" || true
fi
echo "[queue_r4b] done"
