"""Supervised LSTM identifier training entry (reference scripts/Identifier.py).

Usage: python scripts/identifier.py [--iters 2000] [--batch 64] [--cpu]

Samples physical parameters uniformly in their ranges, simulates batched
trajectories in-process, and regresses the parameters from observation
windows; falling parameter sets are masked out of the loss (the vectorized
equivalent of the reference's avoid-list rejection, Identifier.py:17-27,
:67-71).  Checkpoints the identifier params periodically (:90-91).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--window", type=int, default=400)
    p.add_argument("--save_every", type=int, default=100)
    p.add_argument("--log_dir", default="logs/identifier")
    p.add_argument("--policy", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from pointfoot_tpu.sysid.identifier import IdentifierTrainer
    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env("pointfoot_flat", num_envs=args.batch)
    if args.policy:
        from pointfoot_tpu.export.onnx import load_policy_as_jax

        policy_fn = load_policy_as_jax(args.policy)
    else:
        policy_fn = lambda obs: jnp.zeros(obs.shape[:-1] + (6,))

    trainer = IdentifierTrainer(env, policy_fn, window=args.window)
    key = jax.random.PRNGKey(0)
    ident = trainer.init(key)
    env_state = env.init_state(jax.random.PRNGKey(1))
    cmd = jnp.asarray([0.5, 0.0, 0.0])

    os.makedirs(args.log_dir, exist_ok=True)
    for it in range(args.iters):
        key, k = jax.random.split(key)
        ident, m = trainer.train_step(ident, env_state, cmd, k)
        if it % 10 == 0:
            print(f"it {it}: mse {float(m['mse']):.5f} "
                  f"valid {int(m['num_valid'])}/{args.batch}", flush=True)
        if it % args.save_every == 0 or it == args.iters - 1:
            with open(os.path.join(args.log_dir, f"identifier_{it}.pkl"),
                      "wb") as f:
                pickle.dump(jax.device_get(ident.params), f)
    print("done")


if __name__ == "__main__":
    main()
