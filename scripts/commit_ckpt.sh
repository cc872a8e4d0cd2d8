#!/usr/bin/env bash
# Commit the NEWEST checkpoint of a training run to git so long-run progress
# survives a machine wipe (round-2 lesson: the 28.5k rough checkpoint lived
# only in a gitignored logs/ dir and died with the host — docs/ROUND2_NOTES.md
# "Training status").  Only the latest model_N is added (plus metrics +
# resolved run config); earlier checkpoints stay local.
#
# Usage: scripts/commit_ckpt.sh LOG_DIR [msg-suffix]
set -eu

LOG_DIR=$1
SUFFIX=${2:-}
it=$(ls "$LOG_DIR" | grep -E '^model_[0-9]+$' | sed 's/model_//' | sort -n | tail -1)
[ -n "$it" ] || { echo "no checkpoints under $LOG_DIR"; exit 1; }

git add -f "$LOG_DIR/model_$it" "$LOG_DIR/metrics.jsonl"
[ -e "$LOG_DIR/run_config.jsonl" ] && git add -f "$LOG_DIR/run_config.jsonl"
git commit -q -m "Training checkpoint: $(basename "$LOG_DIR") @ $it iters$SUFFIX

No-Verification-Needed: training artifacts only, no code change" || {
  echo "nothing to commit at iter $it"; exit 0; }
echo "committed $LOG_DIR/model_$it"
