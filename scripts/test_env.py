"""Smoke test entry (reference legged_gym/tests/test_env.py:42-56).

Builds a registered task with <=10 envs and steps zero actions for 10x the
episode length; prints 'Done' on success.

Usage: python scripts/test_env.py [--task pointfoot_rough] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="pointfoot_rough")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--episodes", type=float, default=10.0)
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env(args.task, num_envs=min(10, 4096))
    state = env.init_state(jax.random.PRNGKey(0))
    zeros = jnp.zeros((env.num_envs, env.num_actions))

    def body(s, _):
        s, out = env.step(s, zeros)
        return s, out.reward

    steps = int(args.episodes * env.max_episode_length)
    state, rews = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=steps))(state)
    jax.block_until_ready(rews)
    assert bool(jnp.isfinite(rews).all()), "non-finite rewards"
    print("Done")


if __name__ == "__main__":
    main()
