"""Structured policy evaluation: falls / velocity tracking per terrain level.

The round-2 acceptance evidence for the flagship task (VERDICT item 2):
for each commanded vx and terrain level, roll N envs for T seconds with
noise/pushes off and report falls, mean base-frame vx, and episode
survival.  Works for any registered task/checkpoint.

Usage: python scripts/eval_policy.py --task pointfoot_rough \
    --load_run logs/pointfoot_rough/tpu_r2_run2/model_NNNNN \
    [--levels 0 2 4 6] [--vx 0.0 0.4 0.8] [--secs 10]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import pointfoot_tpu.ops.quat as quat_ops
from pointfoot_tpu.utils.registry import task_registry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="pointfoot_rough")
    ap.add_argument("--load_run", required=True)
    ap.add_argument("--num_envs", type=int, default=16)
    ap.add_argument("--levels", type=int, nargs="*", default=[0, 2, 4])
    ap.add_argument("--vx", type=float, nargs="*", default=[0.0, 0.4, 0.8])
    ap.add_argument("--wz", type=float, default=0.0,
                    help="commanded yaw rate for every config")
    ap.add_argument("--secs", type=float, default=10.0)
    args = ap.parse_args()

    env = task_registry.make_env(
        args.task, num_envs=args.num_envs,
        cfg_patch=dict(noise=dict(add_noise=False),
                       domain_rand=dict(push_robots=False)))
    _, tc = task_registry.get_cfgs(args.task)
    runner = task_registry.make_alg_runner(env, args.task, train_cfg=tc)
    ts0, es0 = runner.init(jax.random.PRNGKey(0))
    ts, _ = runner.load(args.load_run, ts0, es0)
    policy = runner.get_inference_policy(ts)
    step = jax.jit(env.step)
    steps = int(args.secs / env.dt)
    flat = env.cfg.terrain.mesh_type == "plane"
    levels = [None] if flat else args.levels

    results = []
    for level in levels:
        for vx_cmd in args.vx:
            state = env.init_state(jax.random.PRNGKey(11))
            if level is not None:
                lv = jnp.full((args.num_envs,), level, jnp.int32)
                state = state.replace(
                    terrain_level=lv,
                    env_origin=env.terrain.env_origins[
                        lv, state.terrain_type])
                # respawn at the forced origins
                phys = state.physics
                new_pos = state.env_origin + jnp.asarray(
                    env.cfg.init_state.pos)
                state = state.replace(physics=phys.replace(
                    base_pos=new_pos))
            cmd = jnp.asarray([vx_cmd, 0.0, args.wz])
            state = env.update_cmd(state, cmd)
            state, out = step(state, jnp.zeros((args.num_envs,
                                                env.num_actions)))
            obs = out.obs
            falls = 0
            vels = []
            wzs = []
            skip = min(50, steps // 4)
            for t in range(steps):
                state, out = step(state, policy(obs))
                state = env.update_cmd(state, cmd)
                obs = out.obs
                falls += int(np.sum(np.asarray(
                    out.extras.get("terminate", out.done))))
                if t >= skip:
                    vb = quat_ops.rotate_inverse(
                        state.physics.base_quat, state.physics.base_lin_vel)
                    vels.append(np.asarray(vb[:, 0]))
                    wb = quat_ops.rotate_inverse(
                        state.physics.base_quat, state.physics.base_ang_vel)
                    wzs.append(np.asarray(wb[:, 2]))
            rec = {
                "level": level, "cmd_vx": vx_cmd,
                "falls": falls, "envs": args.num_envs,
                "secs": args.secs,
                "mean_vx": round(float(np.mean(vels)), 3),
                "cmd_wz": args.wz,
                "mean_wz": round(float(np.mean(wzs)), 3),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    total_falls = sum(r["falls"] for r in results)
    print(json.dumps({"total_falls": total_falls,
                      "configs": len(results)}))


if __name__ == "__main__":
    main()
