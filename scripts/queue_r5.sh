#!/usr/bin/env bash
# Round-5 sequencer: wait for the round-4 watchdog (tpu_r4_storm -> 200k) to
# finish, then continue the SAME run 200k -> 300k with identical settings
# (same HLO => warm tunnel cache, no fresh 10-25 min compile) toward the
# terrain_level >= 6 target (VERDICT r4 item 1).  The slope evidence:
# global level 4.73 @ 176k -> ~5.0 @ 195k under cap+clip+max_lr; checkpoints
# land every 1000 iters so we can stop the moment >= 6 is sustained.
set -u
cd "$(dirname "$0")/.."

PREV_PID=${1:-}
if [ -n "$PREV_PID" ]; then
  echo "[queue_r5] waiting for previous watchdog pid $PREV_PID"
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
fi

echo "[queue_r5] launching 200k -> 300k continuation"
STALE_S=2400 exec bash scripts/train_watchdog.sh logs/pointfoot_rough/tpu_r4_storm 300000 \
  --task=pointfoot_rough --num_envs 4096 --log_every 50 \
  --override terrain.procedural=true \
  --override rewards.clip_reward=20.0 \
  --override terrain.stairs_up_height_cap=0.12 \
  --train_override algorithm.max_lr=2.5e-4 \
  --train_override runner.save_interval=1000
