#!/usr/bin/env python3
"""Per-terrain-family curriculum stats from a checkpoint's env state.

The terrain_level metric is a global mean over 4096 envs; the round-4
diagnosis (docs/ROUND4_NOTES.md §2) showed it is dominated by a single
binding family (stairs_up).  This tool reproduces that per-column
histogram for any checkpoint: family mean level, share stuck at level 0,
and the global mean — the numbers the terrain_level >= 6 "done" bar is
judged by (VERDICT r4 item 1: global >= 6 AND stairs_up family >= 5).

Usage: python scripts/terrain_family_stats.py LOG_DIR/model_N [--task T]
"""

import argparse
import json

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the tunnel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--task", default="pointfoot_rough")
    args = ap.parse_args()

    import numpy as np

    import orbax.checkpoint as ocp

    from pointfoot_tpu.utils.registry import task_registry

    raw = ocp.PyTreeCheckpointer().restore(
        __import__("os").path.abspath(args.ckpt))
    es = raw["env_state"]
    level = np.asarray(es["terrain_level"])
    ttype = np.asarray(es["terrain_type"])

    env = task_registry.make_env(args.task, num_envs=8)
    cfg = env.cfg.terrain
    # family boundaries from the cumulative proportions over num_cols
    # (grid.py: cell type = column index bucketed by proportions)
    # grid.py `choice < p[k]` semantics (reference terrain.py:49): the
    # k-th proportion is smooth_slope (split down/up within its band),
    # rough_slope, stairs_up, stairs_down, discrete, then the extended
    # stepping_stones / gap / pit families
    props = list(cfg.terrain_proportions)
    names = ["smooth_slope", "rough_slope", "stairs_up", "stairs_down",
             "discrete_obstacles", "stepping_stones", "gap",
             "pit"][: len(props)]
    ncols = cfg.num_cols
    cum, acc = [], 0.0
    for p in props:
        acc += p
        cum.append(acc)
    bounds = [int(round(c / max(acc, 1e-9) * ncols)) for c in cum]
    lo = 0
    rows = []
    for name, hi in zip(names, bounds):
        if hi <= lo:
            lo = hi
            continue
        m = (ttype >= lo) & (ttype < hi)
        if m.sum() == 0:
            lo = hi
            continue
        rows.append({
            "family": name, "cols": f"{lo}-{hi - 1}",
            "envs": int(m.sum()),
            "mean_level": round(float(level[m].mean()), 2),
            "stuck_at_0_pct": round(100.0 * float(
                (level[m] == 0).mean()), 1),
        })
        lo = hi
    out = {"ckpt": args.ckpt, "iteration": int(raw.get("iteration", -1)),
           "global_mean_level": round(float(level.mean()), 3),
           "families": rows}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
