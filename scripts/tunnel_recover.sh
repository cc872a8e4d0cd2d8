#!/usr/bin/env bash
# Probe the axon TPU tunnel until it answers, then launch the training
# watchdog.  The tunnel is known to wedge (docs/ROUND2_NOTES.md
# "Operational hazards"); while wedged, every client blocks forever at
# device enumeration, so a cheap single-client probe is the only safe
# health check.  Exactly one probe runs at a time (single-client
# footprint — parallel clients are what storm the tunnel in the first
# place).
#
# Usage: scripts/tunnel_recover.sh LOG_DIR MAX_ITERS [extra train args...]
set -u

LOG_DIR=$1
MAX_ITERS=$2
shift 2
PROBE_S=${PROBE_S:-300}

while true; do
  if bash "$(dirname "$0")/tpu_probe.sh"; then
    echo "[recover] tunnel answers — launching watchdog"
    STALE_S=${STALE_S:-900} exec bash scripts/train_watchdog.sh \
      "$LOG_DIR" "$MAX_ITERS" "$@"
  fi
  echo "[recover] tunnel still wedged $(date -u +%H:%M:%S), retry in ${PROBE_S}s"
  sleep "$PROBE_S"
done
