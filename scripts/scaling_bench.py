"""Scaling-efficiency harness (BASELINE.json configs[4]).

Measures env-throughput of the dp-sharded step at increasing device counts
and reports efficiency vs linear scaling.  On a real pod slice run it under
`jax.distributed` (parallel/mesh.multihost_init); on this dev box it runs on
the virtual CPU mesh (`--cpu N`), which validates the sharded code path and
the harness itself (CPU "devices" share cores, so efficiency numbers there
are not ICI numbers — they are recorded for plumbing, not perf claims).

Usage: python scripts/scaling_bench.py [--cpu 8] [--envs_per_device 512]
       [--steps 20] [--task pointfoot_rough]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", type=int, default=0,
                   help="force N virtual CPU devices")
    p.add_argument("--envs_per_device", type=int, default=512)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--task", default="pointfoot_rough")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}").strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from pointfoot_tpu.parallel.mesh import (
        env_sharding, make_mesh, shard_batch)
    from pointfoot_tpu.utils.registry import task_registry

    n_avail = len(jax.devices())
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]
    results = []
    base_rate = None
    for nd in counts:
        B = args.envs_per_device * nd
        env = task_registry.make_env(args.task, num_envs=B)
        mesh = make_mesh(nd)
        state = shard_batch(env.init_state(jax.random.PRNGKey(0)), mesh)
        actions = jax.device_put(jnp.zeros((B, env.num_actions)),
                                 env_sharding(mesh))

        def many(state):
            def body(s, _):
                s, out = env.step(s, actions)
                return s, out.reward

            return jax.lax.scan(body, state, None, length=args.steps)

        run = jax.jit(many, donate_argnums=0)
        state, rew = run(state)
        jax.block_until_ready(rew)
        t0 = time.perf_counter()
        state, rew = run(state)
        jax.block_until_ready(rew)
        dt = time.perf_counter() - t0
        rate = B * args.steps / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        results.append({"devices": nd, "envs": B,
                        "steps_per_sec": round(rate, 1),
                        "efficiency": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
