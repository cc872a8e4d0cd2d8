"""Sim-vs-real per-dimension trajectory comparison plots.

Replaces reference scripts/comparison.py:46-72: overlays each of the 27
observation dimensions of a simulated trajectory against real data, one
subplot per dimension, saved as PNGs.  Inputs are .tlog files (runtime/
recorder) or .npy arrays (N, 27) / npy-of-dicts real data.

Usage: python scripts/comparison.py --sim sim.tlog --real rr1.npy
       [--out cmp.png] [--dims 0-26]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_traj(path: str) -> np.ndarray:
    if path.endswith(".tlog"):
        from pointfoot_tpu.runtime import read_log

        data, _ = read_log(path)
        return data
    arr = np.load(path, allow_pickle=True)
    if arr.dtype == object:  # npy-of-dicts real data
        from pointfoot_tpu.sysid.realdata import real_to_tensor

        return real_to_tensor(path)[:, 0, :]
    return np.asarray(arr, np.float32).reshape(len(arr), -1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sim", required=True)
    p.add_argument("--real", required=True)
    p.add_argument("--out", default="comparison.png")
    p.add_argument("--max_steps", type=int, default=1000)
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sim = load_traj(args.sim)[: args.max_steps]
    real = load_traj(args.real)[: args.max_steps]
    dims = min(sim.shape[1], real.shape[1])
    rows = int(np.ceil(dims / 4))
    fig, axs = plt.subplots(rows, 4, figsize=(16, 2.2 * rows))
    axs = np.atleast_2d(axs)
    for d in range(dims):
        ax = axs[d // 4, d % 4]
        ax.plot(sim[:, d], label="sim", lw=0.8)
        ax.plot(real[:, d], label="real", lw=0.8, alpha=0.7)
        ax.set_title(f"obs[{d}]", fontsize=8)
        if d == 0:
            ax.legend(fontsize=7)
    for d in range(dims, rows * 4):
        axs[d // 4, d % 4].axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    err = np.abs(sim[: min(len(sim), len(real)), :dims]
                 - real[: min(len(sim), len(real)), :dims])
    print(f"saved {args.out}; per-dim max err: {err.max(0).round(4).tolist()}")
    print(f"overall max err: {err.max():.4f}  mean err: {err.mean():.4f}")


if __name__ == "__main__":
    main()
