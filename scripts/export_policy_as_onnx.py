"""Standalone ONNX export (reference scripts/export_policy_as_onnx.py).

Usage: python scripts/export_policy_as_onnx.py --task=pointfoot_flat
       [--load_run DIR] [--out policy.onnx]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="pointfoot_flat")
    p.add_argument("--load_run", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from pointfoot_tpu.export.onnx import export_policy_as_onnx
    from pointfoot_tpu.utils.helpers import get_load_path
    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env(args.task, num_envs=1)
    runner = task_registry.make_alg_runner(env, args.task)
    ts0, es0 = runner.init(jax.random.PRNGKey(0))
    _, train_cfg = task_registry.get_cfgs(args.task)
    path = args.load_run or get_load_path(
        os.path.join("logs", train_cfg.runner.experiment_name))
    train_state, _ = runner.load(path, ts0, es0)
    out = args.out or os.path.join(os.path.dirname(path), "policy.onnx")
    export_policy_as_onnx(train_state.params, env.num_obs, out)
    print(f"exported to {out}")


if __name__ == "__main__":
    main()
