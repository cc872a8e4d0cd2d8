"""Trajectory-equality / determinism probe (reference scripts/shape.py:33-37).

Compares two recorded trajectories (.tlog or .npy) element-wise and reports
where they diverge — the determinism check the reference did by eyeballing
tensors.

Usage: python scripts/shape.py a.tlog b.tlog [--atol 1e-6]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load(path):
    if path.endswith(".tlog"):
        from pointfoot_tpu.runtime import read_log

        return read_log(path)[0]
    return np.asarray(np.load(path), np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("a")
    p.add_argument("b")
    p.add_argument("--atol", type=float, default=1e-6)
    args = p.parse_args()
    a, b = load(args.a), load(args.b)
    n = min(len(a), len(b))
    if len(a) != len(b):
        print(f"length mismatch: {len(a)} vs {len(b)}; comparing first {n}")
    diff = np.abs(a[:n] - b[:n])
    if diff.max() <= args.atol:
        print(f"EQUAL within atol={args.atol} over {n} steps")
    else:
        first = int(np.argwhere(diff.max(axis=1) > args.atol)[0, 0])
        print(f"DIVERGE at step {first}: max err {diff.max():.3e} "
              f"(dim {int(diff[first].argmax())})")


if __name__ == "__main__":
    main()
