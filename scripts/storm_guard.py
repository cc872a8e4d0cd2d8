#!/usr/bin/env python3
"""Automated value-loss-storm detector over a run's metrics.jsonl.

Round-4 storms were found by a human reading metrics.jsonl hours later
(VERDICT r4 weakness 3).  This guard encodes the observed signature —
value_loss excursions + noise_std inflation (docs/ROUND4_NOTES.md §0
thread 0: vloss 1k-8.6k, noise 0.46 -> 1.0, tracking collapse) — so the
training watchdog can alarm (and optionally halt) within one poll
interval instead.

Calibration against recorded runs:
  healthy (tpu_r4_storm 115k-200k under clip_reward=20): noise_std max
  0.57, value_loss p95 over any 40-row window < 400;
  storm (control replay, clip 100): value_loss p95 3,641 / max 11,428,
  noise_std up to 0.82-1.0 and still rising at tracking collapse.
Thresholds sit between the two regimes and are env-overridable.

Exit codes: 0 = calm, 1 = STORM (message on stdout), 2 = not enough data.
Usage: storm_guard.py LOG_DIR
"""

import json
import os
import sys


def check(metrics_path,
          window=int(os.environ.get("STORM_WINDOW", 40)),
          vloss_p95_max=float(os.environ.get("STORM_VLOSS_P95", 1500.0)),
          noise_max=float(os.environ.get("STORM_NOISE_STD", 0.70))):
    try:
        with open(metrics_path, "rb") as f:
            try:  # only need the tail; metrics rows are < 2 KB each
                f.seek(-4096 * window, os.SEEK_END)
            except OSError:
                f.seek(0)
            lines = f.read().decode(errors="replace").splitlines()
    except OSError:
        return 2, "no metrics file"
    rows = []
    for ln in lines[-window:]:
        try:
            rows.append(json.loads(ln))
        except ValueError:
            continue
    if len(rows) < max(5, window // 4):
        return 2, f"only {len(rows)} rows"
    vl = sorted(r.get("value_loss", 0.0) for r in rows)
    p95 = vl[min(len(vl) - 1, int(0.95 * len(vl)))]
    # mean of the last 5 noise_std readings (single-row spikes are noise)
    tail_noise = [r.get("noise_std", 0.0) for r in rows[-5:]]
    noise = sum(tail_noise) / len(tail_noise)
    it = rows[-1].get("it", -1)
    if p95 > vloss_p95_max:
        return 1, (f"STORM it={it}: value_loss p95 {p95:.0f} > "
                   f"{vloss_p95_max:.0f} over last {len(vl)} rows")
    if noise > noise_max:
        return 1, (f"STORM it={it}: noise_std {noise:.3f} > {noise_max} "
                   f"(mean of last 5 rows)")
    return 0, (f"calm it={it}: vloss_p95 {p95:.0f}, noise {noise:.3f}")


def main():
    log_dir = sys.argv[1]
    code, msg = check(os.path.join(log_dir, "metrics.jsonl"))
    print(msg)
    if code == 1:
        # sticky alarm artifact next to the run
        with open(os.path.join(log_dir, "STORM_ALARM"), "a") as f:
            f.write(msg + "\n")
    sys.exit(code)


if __name__ == "__main__":
    main()
