"""Identifier evaluation (reference scripts/inference.py:26-49).

Loads a series of identifier checkpoints and reports parameter-regression
MSE on freshly simulated trajectories with known ground-truth parameters.

Usage: python scripts/inference.py --ckpt logs/identifier/identifier_100.pkl
       [--batch 32] [--cpu]
"""

import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="checkpoint file or glob (identifier_*.pkl)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--window", type=int, default=400)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointfoot_tpu.sysid.identifier import IdentifierTrainer
    from pointfoot_tpu.sysid.simulate import simulate_trajectory
    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env("pointfoot_flat", num_envs=args.batch)
    policy_fn = lambda obs: jnp.zeros(obs.shape[:-1] + (6,))
    trainer = IdentifierTrainer(env, policy_fn, window=args.window)
    env_state = env.init_state(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(42)
    target = trainer.sample_params(key)
    nc = len(env.model.collision_body)
    fric = jnp.broadcast_to(
        jnp.mean(target[:, :6], axis=-1, keepdims=True), (args.batch, nc))
    traj, _ = simulate_trajectory(
        env, env_state, policy_fn, fric, target[:, 6], target[:, 7:10],
        jnp.asarray([0.5, 0.0, 0.0]), length=args.window, warmup=100)
    windows = jnp.swapaxes(traj.obs, 0, 1)

    for path in sorted(glob.glob(args.ckpt)):
        with open(path, "rb") as f:
            params = pickle.load(f)
        ident = trainer.init(jax.random.PRNGKey(0))._replace(params=params) \
            if hasattr(trainer.init(jax.random.PRNGKey(0)), "_replace") else None
        pred = trainer.net.apply(params, windows)
        mse = float(jnp.mean((pred - target) ** 2))
        print(f"{os.path.basename(path)}: mse {mse:.6f}")


if __name__ == "__main__":
    main()
