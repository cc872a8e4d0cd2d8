#!/usr/bin/env bash
# Round-5 on-chip measurement batch — run when the chip is FREE (no live
# trainer; each bench.py invocation takes the bench lock anyway).
# Produces one JSON per mode under logs/bench_r5/.
#
#   1. env           — the headline dual-terrain number (regression check)
#   2. train         — full train-iteration steps/s (README row was stale:
#                      564k bench vs 889k-1.0M live; re-measure)
#   3. env_phases    — per-phase env-step cost by ablation (VERDICT r4
#                      item 6 measurement)
#   4. mpc_ilqr@4096 — chunked compile fix validation + solves/s
#                      (VERDICT r4 item 5); also 1024 for the direct
#                      comparison with the round-4 33.6 solves/s
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/bench_r5

run() {
  name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S))"
  timeout 3000 env "$@" python bench.py > "logs/bench_r5/$name.json" 2> "logs/bench_r5/$name.err"
  rc=$?
  tail -1 "logs/bench_r5/$name.json" || true
  [ $rc -ne 0 ] && echo "  rc=$rc (see logs/bench_r5/$name.err)"
}

run env            BENCH_MODE=env
run train          BENCH_MODE=train
run env_phases     BENCH_MODE=env_phases
run mpc_ilqr_1024  BENCH_MODE=mpc_ilqr BENCH_NUM_ENVS=1024
run mpc_ilqr_4096  BENCH_MODE=mpc_ilqr BENCH_NUM_ENVS=4096
echo "=== batch done ($(date -u +%H:%M:%S))"
