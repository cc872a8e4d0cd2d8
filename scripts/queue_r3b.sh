#!/usr/bin/env bash
# Round-3b unattended queue (post depenetration-velocity cap, gen-2 physics):
# 1. flat fine-tune v2 from the healthy 16.5k artifact to 45k (the gen-1 run
#    collapsed repeatedly from catapult reward storms; gen-2 removes them),
#    then the VERDICT-r2-item-4 eval battery;
# 2. rough continuation from the 100k artifact (+30k under stable physics —
#    terrain_level plateaued at 4.6 while catapults poisoned the critic),
#    then the eval battery + GIF.
set -u
cd "$(dirname "$0")/.."

FT2=logs/pointfoot_flat/tpu_r3_ft2
ROUGH=logs/pointfoot_rough/tpu_r3_run1

mkdir -p "$FT2"
if [ ! -e "$FT2/model_16500" ]; then
  cp -r logs/pointfoot_flat/tpu_r3_ft/model_16500 "$FT2/model_16500"
fi
STALE_S=900 bash scripts/train_watchdog.sh "$FT2" 45000 \
  --task=pointfoot_flat --num_envs 4096 --log_every 50
lastf=$(ls "$FT2" | grep -E '^model_[0-9]+$' | sed 's/model_//' | sort -n | tail -1)
if [ -n "${lastf:-}" ]; then
  JAX_PLATFORMS=cpu timeout 2400 python scripts/eval_policy.py \
    --task pointfoot_flat --load_run "$FT2/model_$lastf" \
    --vx 0.0 0.25 0.5 1.0 > "$FT2/eval_$lastf.json" 2>/tmp/eval_ft2_err.log
  bash scripts/commit_ckpt.sh "$FT2" || true
fi

STALE_S=900 bash scripts/train_watchdog.sh "$ROUGH" 130000 \
  --task=pointfoot_rough --num_envs 4096 --log_every 50
lastr=$(ls "$ROUGH" | grep -E '^model_[0-9]+$' | sed 's/model_//' | sort -n | tail -1)
if [ -n "${lastr:-}" ] && [ "$lastr" -ge 130000 ]; then
  JAX_PLATFORMS=cpu timeout 2400 python scripts/eval_policy.py \
    --task pointfoot_rough --load_run "$ROUGH/model_$lastr" \
    > "$ROUGH/eval_$lastr.json" 2>/tmp/eval_rough2_err.log
  JAX_PLATFORMS=cpu timeout 2400 python scripts/make_gif.py --mode policy \
    --task pointfoot_rough --load_run "$ROUGH/model_$lastr" \
    --steps 250 --out docs/walk_rough_policy.gif > /dev/null 2>&1
  bash scripts/commit_ckpt.sh "$ROUGH" || true
fi
echo "[queue_r3b] all stages done"
