#!/usr/bin/env bash
# Round-3 unattended queue: after the rough watchdog (already running,
# target 100k iters) finishes, produce the rough eval battery + GIF, then
# fine-tune the flat policy (VERDICT r2 items 2 and 4) and eval it.
# CPU-pinned artifacts run even if the tunnel is busy.
set -u
cd "$(dirname "$0")/.."

ROUGH=logs/pointfoot_rough/tpu_r3_run1
FT=logs/pointfoot_flat/tpu_r3_ft

echo "[queue_r3] waiting for rough watchdog to reach 100000"
while true; do
  last=$(ls "$ROUGH" | grep -E '^model_[0-9]+$' | sed 's/model_//' | sort -n | tail -1)
  if [ -n "${last:-}" ] && [ "$last" -ge 100000 ]; then break; fi
  # if the watchdog died (no trainer, target unmet), restart it
  if ! pgrep -f "train_watchdog.sh $ROUGH" > /dev/null 2>&1; then
    if ! ls /proc/*/cmdline 2>/dev/null | xargs -I{} sh -c 'tr "\0" " " < {} 2>/dev/null' \
        | grep -q "train_watchdog.sh $ROUGH"; then
      echo "[queue_r3] rough watchdog gone at $last — relaunching"
      STALE_S=900 nohup bash scripts/train_watchdog.sh "$ROUGH" 100000 \
        --task=pointfoot_rough --num_envs 4096 --log_every 50 \
        >> /tmp/watchdog_r3.log 2>&1 &
    fi
  fi
  sleep 120
done
echo "[queue_r3] rough done @ $last"

JAX_PLATFORMS=cpu timeout 2400 python scripts/eval_policy.py \
  --task pointfoot_rough --load_run "$ROUGH/model_$last" \
  > "$ROUGH/eval_$last.json" 2>/tmp/eval_rough_err.log
JAX_PLATFORMS=cpu timeout 2400 python scripts/make_gif.py --mode policy \
  --task pointfoot_rough --load_run "$ROUGH/model_$last" \
  --steps 250 --out docs/walk_rough_policy.gif > /dev/null 2>&1
bash scripts/commit_ckpt.sh "$ROUGH" || true

# ---- flat fine-tune under the corrected objective + fixed physics ----
mkdir -p "$FT"
if [ ! -e "$FT/model_4500" ]; then
  cp -r logs/pointfoot_flat/tpu_run7/model_4500 "$FT/model_4500"
fi
STALE_S=900 bash scripts/train_watchdog.sh "$FT" 16500 \
  --task=pointfoot_flat --num_envs 4096 --log_every 50
lastf=$(ls "$FT" | grep -E '^model_[0-9]+$' | sed 's/model_//' | sort -n | tail -1)
if [ -n "${lastf:-}" ]; then
  JAX_PLATFORMS=cpu timeout 2400 python scripts/eval_policy.py \
    --task pointfoot_flat --load_run "$FT/model_$lastf" \
    --vx 0.0 0.25 0.5 1.0 > "$FT/eval_$lastf.json" 2>/dev/null
  bash scripts/commit_ckpt.sh "$FT" || true
fi
echo "[queue_r3] all stages done"
