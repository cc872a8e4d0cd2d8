#!/usr/bin/env bash
# Round-4 unattended queue (post walking-regression fix, gen-3 physics):
# rough continuation from the healthy 100k artifact (+50k under the fixed
# contact + restored gen-1 joint-limit semantics), trained ON the
# procedural terrain path so the benched configuration IS the trained
# configuration (VERDICT r3 items 4+5).  Then the eval battery (both
# terrain paths), GIF refresh, and checkpoint commit.
set -u
cd "$(dirname "$0")/.."

ROUGH=logs/pointfoot_rough/tpu_r4_run1

# max_lr capped at 2.5e-4: the resume onto the new (procedural) terrain
# realization destabilized at the stock 1e-3 rail — adaptive-LR climbs
# during calm stretches, then a high-advantage batch at ~7e-4..1e-3
# produces KL spikes (up to 91) and the run degrades (noise_std 0.5->0.9,
# tracking 4.1->2.1 over 114k..114.2k).  save_interval 500 keeps the
# Orbax writes and disk growth sane (100-iter saves piled 142 ckpts).
STALE_S=${STALE_S:-2400} bash scripts/train_watchdog.sh "$ROUGH" 150000 \
  --task=pointfoot_rough --num_envs 4096 --log_every 50 \
  --override terrain.procedural=true \
  --train_override algorithm.max_lr=2.5e-4 \
  --train_override runner.save_interval=500
last=$(ls "$ROUGH" | grep -E '^model_[0-9]+$' | sed 's/model_//' | sort -n | tail -1)
if [ -n "${last:-}" ] && [ "$last" -ge 150000 ]; then
  # eval on BOTH terrain representations: the trained (procedural) one and
  # the table path (equivalence-tested, different realization)
  JAX_PLATFORMS=cpu POINTFOOT_PROCTERRAIN=1 timeout 2400 \
    python scripts/eval_policy.py --task pointfoot_rough \
    --load_run "$ROUGH/model_$last" \
    > "$ROUGH/eval_${last}_proc.json" 2>/tmp/eval_r4_proc_err.log
  JAX_PLATFORMS=cpu timeout 2400 python scripts/eval_policy.py \
    --task pointfoot_rough --load_run "$ROUGH/model_$last" \
    > "$ROUGH/eval_${last}_table.json" 2>/tmp/eval_r4_table_err.log
  JAX_PLATFORMS=cpu POINTFOOT_PROCTERRAIN=1 timeout 2400 \
    python scripts/make_gif.py --mode policy --task pointfoot_rough \
    --load_run "$ROUGH/model_$last" --steps 250 \
    --out docs/walk_rough_policy.gif > /dev/null 2>&1
  bash scripts/commit_ckpt.sh "$ROUGH" || true
fi
echo "[queue_r4] all stages done"
