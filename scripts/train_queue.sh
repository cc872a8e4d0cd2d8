#!/usr/bin/env bash
# Unattended TPU training queue: once the tunnel answers, run the rough
# training to its target, then fine-tune the flat policy (stability-crutch
# drift shrinks with budget — docs/ROUND2_NOTES.md "1.8x was a
# misdiagnosis").  Each stage goes through the stale-metrics watchdog so a
# tunnel hang mid-stage only costs one resume, and the tunnel probe runs
# before every stage.
set -u

probe() {
  until bash "$(dirname "$0")/tpu_probe.sh"; do
    echo "[queue] tunnel wedged $(date -u +%H:%M:%S), retry in 300s"
    sleep 300
  done
  echo "[queue] tunnel answers $(date -u +%H:%M:%S)"
}

probe
STALE_S=900 bash scripts/train_watchdog.sh logs/pointfoot_rough/tpu_r2_run2 \
  60000 --task=pointfoot_rough --num_envs 4096 --log_every 50 \
  --override rewards.only_positive_rewards=true

# post-stage artifacts are CPU-pinned (eval_policy/make_gif force
# jax_platforms=cpu) so they run even while the tunnel is busy or wedged
last=$(ls logs/pointfoot_rough/tpu_r2_run2 | grep -E '^model_[0-9]+$' \
  | sed 's/model_//' | sort -n | tail -1)
if [ -n "${last:-}" ]; then
  timeout 1200 python scripts/eval_policy.py --task pointfoot_rough \
    --load_run "logs/pointfoot_rough/tpu_r2_run2/model_$last" \
    > "logs/pointfoot_rough/tpu_r2_run2/eval_$last.json" 2>/dev/null
  timeout 1200 python scripts/make_gif.py --mode policy \
    --task pointfoot_rough \
    --load_run "logs/pointfoot_rough/tpu_r2_run2/model_$last" \
    --steps 250 --out docs/walk_rough_policy.gif > /dev/null 2>&1
fi

probe
# flat fine-tune: continue the committed artifact with the same config
# (reward scales stay reference defaults; budget is the lever)
if [ ! -d logs/pointfoot_flat/tpu_run7_ft/model_12000 ]; then
  mkdir -p logs/pointfoot_flat/tpu_run7_ft
  if [ ! -e logs/pointfoot_flat/tpu_run7_ft/model_4500 ]; then
    # a missing seed must ABORT the stage: without it the watchdog would
    # silently train 12k iters from scratch and mislabel it a fine-tune
    if [ ! -d logs/pointfoot_flat/tpu_run7/model_4500 ]; then
      echo "[queue] seed checkpoint tpu_run7/model_4500 missing — skipping fine-tune"
      exit 1
    fi
    cp -r logs/pointfoot_flat/tpu_run7/model_4500 \
      logs/pointfoot_flat/tpu_run7_ft/model_4500
  fi
  # run7 trained with the stock flat config (no overrides) — match it
  STALE_S=900 bash scripts/train_watchdog.sh logs/pointfoot_flat/tpu_run7_ft \
    12000 --task=pointfoot_flat --num_envs 4096 --log_every 50
fi
lastf=$(ls logs/pointfoot_flat/tpu_run7_ft 2>/dev/null \
  | grep -E '^model_[0-9]+$' | sed 's/model_//' | sort -n | tail -1)
if [ -n "${lastf:-}" ]; then
  timeout 1200 python scripts/eval_policy.py --task pointfoot_flat \
    --load_run "logs/pointfoot_flat/tpu_run7_ft/model_$lastf" \
    --vx 0.0 0.25 0.5 1.0 \
    > "logs/pointfoot_flat/tpu_run7_ft/eval_$lastf.json" 2>/dev/null
fi
echo "[queue] all stages done"
