#!/usr/bin/env bash
# Watchdog for long TPU training runs over the axon PJRT tunnel.
#
# The tunnel is known to silently hang a running trainer (no traceback, the
# process blocks forever in a device transfer — see docs/ROUND2_NOTES.md
# "Operational hazards").  This script launches scripts/train.py and, whenever
# the run's metrics.jsonl stops advancing for STALE_S seconds, kills that
# exact PID (never by pattern) and relaunches from the newest model_* under
# the log dir.  Exits when the target iteration count is reached.
#
# Usage:
#   scripts/train_watchdog.sh LOG_DIR MAX_ITERS [extra train.py args...]
set -u

LOG_DIR=$1
MAX_ITERS=$2
shift 2
EXTRA_ARGS=("$@")
STALE_S=${STALE_S:-300}
POLL_S=${POLL_S:-60}

latest_ckpt() {
  ls "$LOG_DIR" 2>/dev/null | grep -E '^model_[0-9]+$' | sed 's/model_//' \
    | sort -n | tail -1
}

while true; do
  it=$(latest_ckpt)
  if [ -n "${it:-}" ] && [ "$it" -ge "$MAX_ITERS" ]; then
    echo "[watchdog] reached $it >= $MAX_ITERS, done"
    exit 0
  fi
  # train.py's --max_iterations counts iterations to run from the current
  # point (learn() semantics), so pass the REMAINING budget on resume.
  remaining=$MAX_ITERS
  resume_args=()
  if [ -n "${it:-}" ]; then
    remaining=$((MAX_ITERS - it))
    resume_args=(--resume --load_run "$LOG_DIR/model_$it")
    echo "[watchdog] launching from iter $it ($remaining to go)"
  else
    echo "[watchdog] launching fresh"
  fi
  python scripts/train.py --log_dir "$LOG_DIR" --max_iterations "$remaining" \
    "${resume_args[@]}" "${EXTRA_ARGS[@]}" \
    > "/tmp/watchdog_train_$(basename "$LOG_DIR").log" 2>&1 &
  PID=$!
  LAUNCH_TS=$(date +%s)
  echo "[watchdog] trainer pid $PID"
  # Give compile + restore time before staleness checks bite.
  sleep 180
  while kill -0 "$PID" 2>/dev/null; do
    now=$(date +%s)
    m="$LOG_DIR/metrics.jsonl"
    mt=$(stat -c %Y "$m" 2>/dev/null || echo 0)
    # Staleness is relative to the NEWER of (last metrics write, this
    # trainer's launch): metrics.jsonl predates the launch, and judging a
    # fresh trainer by the previous trainer's last write kills every
    # relaunch 180 s in — before restore + compile + the first 50-iter
    # metrics flush can touch the file (observed: a ~1 h kill/relaunch
    # churn loop with zero training progress).
    if [ "$mt" -lt "$LAUNCH_TS" ]; then
      mt=$LAUNCH_TS
    fi
    # a bench holds .bench_lock while the trainer deliberately pauses
    # (utils/benchlock.py) — that is not a hang; reset the staleness clock
    if [ -e "$(dirname "$0")/../.bench_lock" ]; then
      mt=$now
    fi
    if [ $((now - mt)) -gt "$STALE_S" ]; then
      echo "[watchdog] metrics stale $((now - mt))s — killing $PID"
      kill "$PID" 2>/dev/null
      sleep 5
      kill -9 "$PID" 2>/dev/null
      break
    fi
    # Storm guard (VERDICT r4 item 3): alarm on the recorded value-loss
    # storm signature (scripts/storm_guard.py; writes LOG_DIR/STORM_ALARM).
    # STORM_HALT=1 additionally stops the run so a human (or queue script)
    # can resume from a pre-storm checkpoint instead of training on.
    guard_out=$(python "$(dirname "$0")/storm_guard.py" "$LOG_DIR" 2>/dev/null)
    guard_rc=$?
    if [ "$guard_rc" -eq 1 ]; then
      echo "[watchdog] $guard_out"
      if [ "${STORM_HALT:-0}" = 1 ]; then
        echo "[watchdog] STORM_HALT=1 — halting trainer $PID"
        kill "$PID" 2>/dev/null
        sleep 5
        kill -9 "$PID" 2>/dev/null
        exit 3
      fi
    fi
    sleep "$POLL_S"
  done
  wait "$PID" 2>/dev/null
  it=$(latest_ckpt)
  if [ -n "${it:-}" ] && [ "$it" -ge "$MAX_ITERS" ]; then
    echo "[watchdog] trainer exited at $it >= $MAX_ITERS, done"
    exit 0
  fi
  echo "[watchdog] trainer exited (iter ${it:-none}), restarting in 10s"
  sleep 10
done
